"""Golden-constant tests for core tables.

Pins the Annex K constants against independent derivations:
  - the canonical-code construction from the DHT BITS/HUFFVAL blobs must
    reproduce the K.3-K.6 size/code arrays (cross-check between the two
    redundant representations the reference carries)
  - zigzag must be an involution-consistent permutation
"""
import numpy as np

from jpezy_tpu.core import tables as T


def test_zigzag_is_permutation():
    assert sorted(T.ZIGZAG.tolist()) == list(range(64))
    # first and last few entries of the T.81 zigzag
    assert T.ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert T.ZIGZAG[-4:].tolist() == [47, 55, 62, 63]
    assert np.array_equal(T.NATURAL_TO_ZIGZAG[T.ZIGZAG], np.arange(64))


def test_quant_tables_annex_k():
    assert T.Y_QUANT[0] == 16 and T.Y_QUANT[63] == 99
    assert T.Y_QUANT.sum() == 3688  # checksum of K.1
    assert T.C_QUANT[0] == 17 and (T.C_QUANT[35:] == 99).all()
    assert T.C_QUANT.sum() == 5505  # checksum of K.2


def test_dc_tables_match_canonical_build():
    for bits, vals, sizes_ref, codes_ref in [
        (T.DC_LUMA_BITS, T.DC_LUMA_VALS, T.Y_DC_SIZE, T.Y_DC_CODE),
        (T.DC_CHROMA_BITS, T.DC_CHROMA_VALS, T.C_DC_SIZE, T.C_DC_CODE),
    ]:
        sizes, codes = T.build_canonical_codes(bits)
        assert list(vals) == list(range(12))  # HUFFVAL is identity for DC
        assert np.array_equal(sizes, sizes_ref)
        assert np.array_equal(codes, codes_ref)


def test_ac_tables_match_canonical_build():
    for bits, vals, sizes_ref, codes_ref in [
        (T.AC_LUMA_BITS, T.AC_LUMA_VALS, T.Y_AC_SIZE, T.Y_AC_CODE),
        (T.AC_CHROMA_BITS, T.AC_CHROMA_VALS, T.C_AC_SIZE, T.C_AC_CODE),
    ]:
        sizes, codes = T.build_canonical_codes(bits)
        flat_size, flat_code = T.huffval_to_flat_ac(vals, sizes, codes)
        assert np.array_equal(flat_size, sizes_ref)
        # compare codes as unsigned 16-bit
        assert np.array_equal(
            flat_code.astype(np.uint16), codes_ref.astype(np.uint16)
        )


def test_ac_symbol_index_layout():
    assert T.ac_symbol_index(0, 1) == 1
    assert T.ac_symbol_index(15, 0) == 151 == T.ZRL_INDEX
    assert T.ac_symbol_index(15, 10) == 161
    assert T.EOB_INDEX == 0
    # all (run, size) pairs map to unique slots in 0..161
    idxs = {T.ac_symbol_index(r, s) for r in range(16) for s in range(1, 11)}
    idxs |= {T.EOB_INDEX, T.ZRL_INDEX}
    assert len(idxs) == 162
    assert min(idxs) == 0 and max(idxs) == 161


def test_dht_segment_blob_layout():
    seg = T.dht_segment(0, 0, T.DC_LUMA_BITS, T.DC_LUMA_VALS)
    # reference YDcDht blob: FF C4 00 1F 00 <16 bits> <12 vals>
    assert seg[:5] == bytes([0xFF, 0xC4, 0x00, 0x1F, 0x00])
    assert len(seg) == 33
    seg = T.dht_segment(1, 1, T.AC_CHROMA_BITS, T.AC_CHROMA_VALS)
    assert seg[:5] == bytes([0xFF, 0xC4, 0x00, 0xB5, 0x11])
    assert len(seg) == 183
