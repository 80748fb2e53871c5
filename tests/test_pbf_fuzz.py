"""Property/fuzz tests for the from-scratch PBF decoder (sources/pbf.py —
VERDICT r03 item 8): a minimal protobuf wire-format ENCODER lives here in the
test, so the decoder is exercised against independently-constructed frames —
densenodes delta/zigzag edges, granularity/offset variants, tag key_vals
framing, way/relation delta refs, raw-vs-zlib blobs, the typed error paths
for exotic codecs, and frame-scan robustness on truncated files. No Spark
session needed: decode_block / blob_frames / stitch_rings are pure."""

import os
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_public_space_mapper_spark.sources.pbf import (
    blob_frames,
    decode_block,
    stitch_rings,
)

# --- tiny protobuf wire encoder (test-side, independent of the decoder) ----


def vint(v: int) -> bytes:
    assert v >= 0
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zz(v: int) -> int:
    return (v << 1) if v >= 0 else (-v << 1) - 1


def fv(fno: int, v: int) -> bytes:  # varint field
    return vint((fno << 3) | 0) + vint(v)


def fld(fno: int, payload: bytes) -> bytes:  # length-delimited field
    return vint((fno << 3) | 2) + vint(len(payload)) + payload


def packed(values, signed: bool) -> bytes:
    return b"".join(vint(zz(int(v)) if signed else int(v)) for v in values)


def string_table(strings: list[str]) -> bytes:
    return b"".join(fld(1, s.encode("utf-8")) for s in strings)


def dense_nodes(ids, lats, lons, keys_vals=()) -> bytes:
    def deltas(seq):
        seq = list(seq)
        return [seq[0]] + [b - a for a, b in zip(seq, seq[1:])] if seq else []

    msg = fld(1, packed(deltas(ids), True))
    msg += fld(8, packed(deltas(lats), True))
    msg += fld(9, packed(deltas(lons), True))
    if keys_vals:
        msg += fld(10, packed(keys_vals, False))
    return msg


def primitive_block(strings, groups, granularity=None, lat_off=None, lon_off=None) -> bytes:
    msg = fld(1, string_table(strings))
    for g in groups:
        msg += fld(2, g)
    if granularity is not None:
        msg += fv(17, granularity)
    if lat_off is not None:
        msg += fv(19, lat_off)
    if lon_off is not None:
        msg += fv(20, lon_off)
    return msg


def blob_zlib(block: bytes) -> bytes:
    return fv(2, len(block)) + fld(3, zlib.compress(block))


def blob_raw(block: bytes) -> bytes:
    return fld(1, block)


def way_msg(wid, refs, key_ids=(), val_ids=()) -> bytes:
    def deltas(seq):
        seq = list(seq)
        return [seq[0]] + [b - a for a, b in zip(seq, seq[1:])] if seq else []

    msg = fv(1, wid)
    if key_ids:
        msg += fld(2, packed(key_ids, False))
        msg += fld(3, packed(val_ids, False))
    msg += fld(8, packed(deltas(refs), True))
    return fld(3, msg)


def relation_msg(rid, member_ids, role_ids, member_types, key_ids=(), val_ids=()) -> bytes:
    def deltas(seq):
        seq = list(seq)
        return [seq[0]] + [b - a for a, b in zip(seq, seq[1:])] if seq else []

    msg = fv(1, rid)
    if key_ids:
        msg += fld(2, packed(key_ids, False))
        msg += fld(3, packed(val_ids, False))
    msg += fld(8, packed(role_ids, False))
    msg += fld(9, packed(deltas(member_ids), True))
    msg += fld(10, packed(member_types, False))
    return fld(4, msg)


# --- densenodes round-trips -------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**60), max_value=2**60),  # id deltas' cumsum range
            st.integers(min_value=-900000000, max_value=900000000),  # lat 1e-9 deg units /100
            st.integers(min_value=-1800000000, max_value=1800000000),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_densenodes_roundtrip(rows):
    """Arbitrary (possibly descending / negative) id and coordinate sequences
    survive delta+zigzag encode → decode exactly (default granularity 100,
    coords in 1e-7 deg)."""
    ids = [r[0] for r in rows]
    lats = [r[1] for r in rows]
    lons = [r[2] for r in rows]
    block = primitive_block(
        [""], [fld(2, dense_nodes(ids, lats, lons))]
    )
    out = decode_block(blob_zlib(block))
    gids, glons, glats, gtags = out["nodes"]
    assert gids.tolist() == ids
    np.testing.assert_allclose(glats, [1e-9 * 100 * v for v in lats], rtol=0, atol=1e-12)
    np.testing.assert_allclose(glons, [1e-9 * 100 * v for v in lons], rtol=0, atol=1e-12)
    assert gtags == [{} for _ in ids]  # no keys_vals → all empty


def test_densenodes_granularity_and_offsets():
    """Non-default granularity/lat_offset/lon_offset scale and shift."""
    ids, lats, lons = [7], [1000], [2000]
    block = primitive_block(
        [""],
        [fld(2, dense_nodes(ids, lats, lons))],
        granularity=50,
        lat_off=500,
        lon_off=-0 + 300,
    )
    out = decode_block(blob_raw(block))
    _, glons, glats, _ = out["nodes"]
    assert glats[0] == pytest.approx(1e-9 * (500 + 50 * 1000))
    assert glons[0] == pytest.approx(1e-9 * (300 + 50 * 2000))


def test_densenodes_keys_vals_framing():
    """keys_vals is k,v,...,0 per node; trailing nodes may omit even the 0
    end marker — they must decode as tag-less, not crash or misalign."""
    strings = ["", "highway", "primary", "name", "x"]
    ids = [1, 2, 3, 4]
    kv = [1, 2, 0,  3, 4, 1, 2, 0,  0]  # node1 {highway:primary}; node2 two tags; node3 {}; node4 omitted
    block = primitive_block(
        [*strings], [fld(2, dense_nodes(ids, [0, 1, 2, 3], [0, 1, 2, 3], kv))]
    )
    out = decode_block(blob_zlib(block))
    tags = out["nodes"][3]
    assert tags == [
        {"highway": "primary"},
        {"name": "x", "highway": "primary"},
        {},
        {},
    ]


# --- ways / relations -------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=2**40),
    st.lists(st.integers(min_value=1, max_value=2**55), min_size=2, max_size=30),
)
def test_way_refs_roundtrip(wid, refs):
    """Way node refs (delta-coded, any order so deltas go negative) decode
    exactly; tags resolve through the string table."""
    block = primitive_block(
        ["", "building", "yes"], [way_msg(wid, refs, key_ids=[1], val_ids=[2])]
    )
    out = decode_block(blob_zlib(block))
    (gwid, grefs, gtags), = out["ways"]
    assert gwid == wid and grefs == refs
    assert gtags == {"building": "yes"}


def test_relation_members_roundtrip():
    block = primitive_block(
        ["", "type", "multipolygon", "outer", "inner"],
        [relation_msg(9, [11, 5, 30], [3, 4, 3], [1, 1, 1], key_ids=[1], val_ids=[2])],
    )
    out = decode_block(blob_raw(block))
    (rid, tags, members), = out["relations"]
    assert rid == 9 and tags == {"type": "multipolygon"}
    assert members == [(11, "outer", 1), (5, "inner", 1), (30, "outer", 1)]


def test_mixed_groups_accumulate():
    """Multiple primitive groups in one block: all entities surface."""
    g1 = fld(2, dense_nodes([1, 2], [0, 10], [0, 10]))
    g2 = way_msg(100, [1, 2])
    g3 = relation_msg(200, [100], [0], [1])
    out = decode_block(blob_zlib(primitive_block([""], [g1, g2, g3])))
    assert len(out["nodes"][0]) == 2 and len(out["ways"]) == 1 and len(out["relations"]) == 1


# --- error paths ------------------------------------------------------------


@pytest.mark.parametrize(
    "fno,codec",
    [(4, "lzma"), (5, "bzip2"), (6, "lz4"), (7, "zstd")],
)
def test_exotic_codec_blob_raises_typed_error(fno, codec):
    payload = fv(2, 10) + fld(fno, b"\x00" * 10)
    with pytest.raises(ValueError, match=codec):
        decode_block(payload)


def test_empty_blob_raises():
    with pytest.raises(ValueError, match="unsupported PBF blob compression"):
        decode_block(fv(2, 4))  # raw_size only, no data field at all


def test_corrupt_zlib_raises():
    payload = fv(2, 10) + fld(3, b"not zlib data")
    with pytest.raises(zlib.error):
        decode_block(payload)


# --- frame scan -------------------------------------------------------------


def _write_frame(f, btype: str, payload: bytes):
    hdr = fld(1, btype.encode()) + fv(3, len(payload))
    f.write(len(hdr).to_bytes(4, "big"))
    f.write(hdr)
    f.write(payload)


def test_blob_frames_offsets_and_truncation(tmp_path):
    """Frame scan returns exact payload (type, offset, size) triples and
    stops cleanly at a truncated trailing frame (partial header length)."""
    p = str(tmp_path / "synthetic.osm.pbf")
    blk = blob_zlib(primitive_block([""], [fld(2, dense_nodes([1], [0], [0]))]))
    with open(p, "wb") as f:
        _write_frame(f, "OSMHeader", b"\x00" * 12)
        _write_frame(f, "OSMData", blk)
        f.write(b"\x00\x01")  # truncated next header-length prefix
    frames = blob_frames(p)
    assert [t for t, _, _ in frames] == ["OSMHeader", "OSMData"]
    btype, off, size = frames[1]
    with open(p, "rb") as f:
        f.seek(off)
        assert f.read(size) == blk
    out = decode_block(blk)
    assert out["nodes"][0].tolist() == [1]


# --- ring stitching ---------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=5, max_value=24), st.randoms(use_true_random=False))
def test_stitch_rings_reassembles_shuffled_fragments(n, rnd):
    """A closed ring split at random points into fragments — some reversed,
    all shuffled — must stitch back to one closed ring with the same vertex
    SET and length."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([np.cos(ang).round(6), np.sin(ang).round(6)], axis=1)
    closed = np.vstack([ring, ring[:1]])
    cuts = sorted(rnd.sample(range(1, n), min(3, n - 1)))
    frags = []
    prev = 0
    for c in cuts + [n]:
        frags.append(closed[prev : c + 1])
        prev = c
    frags = [f[::-1] if rnd.random() < 0.5 else f for f in frags]
    rnd.shuffle(frags)
    rings = stitch_rings(frags)
    assert rings is not None and len(rings) == 1
    got = rings[0]
    assert np.array_equal(got[0], got[-1]) and len(got) == len(closed)
    assert {tuple(v) for v in got} == {tuple(v) for v in closed}


def test_stitch_rings_open_chain_returns_none():
    a = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([[1.0, 0.0], [2.0, 0.0]])  # never closes
    assert stitch_rings([a, b]) is None
