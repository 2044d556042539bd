"""Core numeric constants of the AGAThA alignment semantics.

These mirror the reference's compile-time constants so that scores are
bit-identical (reference: AGAThA/src/gasal_kernels.h:38-41,
AGAThA/Makefile:4-5).
"""

# Sentinel "minus infinity" used to initialise DP strips outside the band.
# Reference: gasal_kernels.h:39  (MINUS_INF2 = SHRT_MIN/2)
MINUS_INF2 = -16384  # SHRT_MIN / 2

# int32 minimum; initial value of the per-antidiagonal max ring.
# Reference: agatha_kernel.h:152 (INT_MIN)
INT32_MIN = -(2**31)

# ASCII byte used to pad sequences to a multiple of 8 bases.
# Reference: Makefile:5 (N_CODE=0x4E == 'N'), host_batch.cpp N padding.
N_CODE = 0x4E

# 4-bit code of 'N' after packing (N_CODE & 0xF).
# Reference: gasal_kernels.h:41 (N_VALUE).
N_VALUE = N_CODE & 0xF  # == 14

# Penalty applied when either base of a pair is N (positive magnitude).
# Reference: Makefile:4 (N_PENALTY=1) + gasal_kernels.h:48-50: any
# comparison involving N scores -N_PENALTY.
N_PENALTY = 1

# Bases per packed 32-bit word (4-bit codes, 8 per word).
# Reference: agatha_kernel.h:75 (packed_len).
PACKED_LEN = 8

# 4-bit base codes produced by `ord(ch) & 0xF` (reference packs raw ASCII
# bytes and masks the low nibble: kernels/pack_rc_seqs.h:24-31).
BASE_CODE = {
    "A": ord("A") & 0xF,  # 1
    "C": ord("C") & 0xF,  # 3
    "G": ord("G") & 0xF,  # 7
    "T": ord("T") & 0xF,  # 4
    "N": N_VALUE,         # 14
}

# Complement map over 4-bit codes, matching the reference's
# reverse-complement kernel (kernels/pack_rc_seqs.h:56-212): A<->T, C<->G,
# N stays N.  Codes outside {A,C,G,T} are left unchanged (the reference
# only ever complements A/C/G/T; N keeps its code because the kernel
# skips N nibbles).
COMPLEMENT_CODE = {1: 4, 4: 1, 3: 7, 7: 3}

# Sequence-op bits from the FASTA header's first character
# (test_prog.cpp:83-92): bit0 = reverse, bit1 = complement.
OP_CHARS = "></+"
OP_FORWARD_NATURAL = 0      # '>'
OP_REVERSE_NATURAL = 1      # '<'
OP_FORWARD_COMPLEMENT = 2   # '/'
OP_REVERSE_COMPLEMENT = 3   # '+'
