"""Pallas TPU kernels — the native compute path of the framework.

The reference implements its inner scans as OpenCL C device kernels
(SURVEY.md components R1-R4); these are their TPU-native counterparts,
lowered through Mosaic to TPU machine code.  See kernels/swar.py for the
word-packed (SWAR) design forced by the hardware: Mosaic on TPU v5e has no
int8 vector compare, so all byte work is done 4 bytes at a time in int32
lanes — which is also simply faster.
"""

from .swar import (
    HALO_WORDS,
    MAX_PATTERN,
    naive_nib,
    pattern_words,
    screened_nib,
    swar_supported,
)

__all__ = [
    "HALO_WORDS",
    "MAX_PATTERN",
    "naive_nib",
    "pattern_words",
    "screened_nib",
    "swar_supported",
]
