"""5-bit residue packing (SURVEY §2.2 P2) — bit-compatible with the
reference's SRA DB codec.

Reference: 3 residues per uint16, 5 bits each, the sequence's LAST word
flagged with the high bit (PACK_TO_SHORT / GET_*_CHAR,
/root/reference/src/commons/BitManipulateMacros.h:10-17; writer
src/sra/convert2sradb.cpp:134-157; reader
src/commons/SRADBReader.cpp:236-265).

Parquet + ZSTD makes this codec unnecessary as a storage format
(SURVEY §1.4) — these kernels exist for BIT-IDENTITY with reference DB
files: pack to compare bytes against a reference-produced SRA DB, unpack
to ingest one. Pure numpy, usable directly or under mapInPandas on a
BINARY column.

Packing uses the residue's 5 low bits of its ASCII code (the reference
packs `aa & 0x1F`), so round-trip is exact for A-Z."""

from __future__ import annotations

import numpy as np

_END_FLAG = 0x8000


def pack5(seq: str) -> bytes:
    """Sequence -> packed uint16 little-endian words, 3 residues/word,
    last word flagged."""
    if not seq:
        return b""
    codes = (np.frombuffer(seq.encode("ascii"), dtype=np.uint8) & 0x1F).astype(np.uint16)
    n = len(codes)
    n_words = (n + 2) // 3
    padded = np.zeros(n_words * 3, dtype=np.uint16)
    padded[:n] = codes
    tri = padded.reshape(n_words, 3)
    words = (tri[:, 0] << 10) | (tri[:, 1] << 5) | tri[:, 2]
    words[-1] |= _END_FLAG
    return words.astype("<u2").tobytes()


def unpack5(data: bytes, length: int) -> str:
    """Packed words -> sequence of `length` residues (A-Z). The length is
    carried externally (the reference derives it from index offsets,
    SRADBReader.cpp:303-315)."""
    if length == 0:
        return ""
    words = np.frombuffer(data, dtype="<u2").astype(np.uint16) & ~np.uint16(_END_FLAG)
    hi = (words >> 10) & 0x1F
    mid = (words >> 5) & 0x1F
    lo = words & 0x1F
    codes = np.stack([hi, mid, lo], axis=1).reshape(-1)[:length]
    # 5-bit code -> uppercase ASCII (codes are `ch & 0x1F` of A-Z)
    return (codes.astype(np.uint8) | 0x40).tobytes().decode("ascii")
