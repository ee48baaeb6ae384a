"""AVIF/HEIF header walk (r18): item-layer grammar (pitm/iinf/iprp/
ipma/iref) against hand-built boxes, property association in both index
widths, honest refusal classes, byte-flip fuzz, and the decode_image
dispatch routing."""

from __future__ import annotations

import random
import struct

import pytest

from postgres_debezium_clickhouse_spark.operators.heif import (
    _box,
    _full,
    heif_encode_fixture,
    heif_meta_walk,
    is_heif,
)


def test_avif_basic_fields():
    b = heif_encode_fixture("avif", 320, 240, bit_depth=10)
    m = heif_meta_walk(b)
    assert m["brand"] == "avif"
    assert m["primary_type"] == "av01"
    assert (m["width"], m["height"]) == (320, 240)
    assert m["bit_depth"] == 10 and m["n_channels"] == 3
    assert m["n_items"] == 1
    assert not m["has_alpha"] and not m["has_exif"]
    assert m["n_grid_tiles"] == 0


def test_heic_alpha_exif_grid():
    b = heif_encode_fixture("heic", 64, 48, alpha=True, exif=True,
                            grid_tiles=4)
    m = heif_meta_walk(b)
    assert m["brand"] == "heic"
    assert m["primary_type"] == "grid"
    assert m["has_alpha"] and m["has_exif"]
    assert m["n_grid_tiles"] == 4
    assert m["n_items"] == 1 + 1 + 1 + 4


def test_ipma_16bit_index_form():
    # rebuild a fixture but with flags&1 (16-bit property indexes) —
    # the other wire form of the association table
    base = heif_encode_fixture("avif", 100, 50)
    # construct manually: same boxes but ipma with flags=1
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", 100, 50))
    pixi = _full(b"pixi", 0, 0, bytes([3, 8, 8, 8]))
    ipco = _box(b"ipco", ispe + pixi)
    ipma = _full(b"ipma", 0, 1,
                 (1).to_bytes(4, "big") + (1).to_bytes(2, "big")
                 + bytes([2]) + (0x8001).to_bytes(2, "big")
                 + (0x0002).to_bytes(2, "big"))
    iprp = _box(b"iprp", ipco + ipma)
    infe = _full(b"infe", 2, 0,
                 (1).to_bytes(2, "big") + b"\x00\x00" + b"av01\x00")
    iinf = _full(b"iinf", 0, 0, (1).to_bytes(2, "big") + infe)
    pitm = _full(b"pitm", 0, 0, (1).to_bytes(2, "big"))
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00\x00\x00\x00pict" + b"\x00" * 13)
    meta = _full(b"meta", 0, 0, hdlr + pitm + iinf + iprp)
    ftyp = _box(b"ftyp", b"avif" + b"\x00" * 4 + b"avifmif1")
    m = heif_meta_walk(ftyp + meta)
    assert (m["width"], m["height"]) == (100, 50)
    assert m["bit_depth"] == 8
    assert heif_meta_walk(base)["width"] == 100


def test_v1_pitm_and_v3_infe():
    # 32-bit item ids: pitm v1 + infe v3
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", 12, 34))
    pixi = _full(b"pixi", 0, 0, bytes([1, 12]))
    ipco = _box(b"ipco", ispe + pixi)
    ipma = _full(b"ipma", 1, 0,
                 (1).to_bytes(4, "big") + (70000).to_bytes(4, "big")
                 + bytes([2, 0x81, 0x02]))
    iprp = _box(b"iprp", ipco + ipma)
    infe = _full(b"infe", 3, 0,
                 (70000).to_bytes(4, "big") + b"\x00\x00" + b"hvc1\x00")
    iinf = _full(b"iinf", 1, 0, (1).to_bytes(4, "big") + infe)
    pitm = _full(b"pitm", 1, 0, (70000).to_bytes(4, "big"))
    meta = _full(b"meta", 0, 0, pitm + iinf + iprp)
    ftyp = _box(b"ftyp", b"mif1" + b"\x00" * 4 + b"mif1")
    m = heif_meta_walk(ftyp + meta)
    assert (m["width"], m["height"]) == (12, 34)
    assert m["bit_depth"] == 12 and m["n_channels"] == 1
    assert m["primary_type"] == "hvc1"


def test_refusal_classes():
    with pytest.raises(ValueError, match="no leading ftyp"):
        heif_meta_walk(b"\x00" * 20)
    with pytest.raises(ValueError, match="not a HEIF brand"):
        heif_meta_walk(_box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom"))
    # no meta box
    ftyp = _box(b"ftyp", b"avif" + b"\x00" * 4 + b"avif")
    with pytest.raises(ValueError, match="no meta box"):
        heif_meta_walk(ftyp + _box(b"mdat", b"x"))
    # primary without ispe
    infe = _full(b"infe", 2, 0,
                 (1).to_bytes(2, "big") + b"\x00\x00av01\x00")
    iinf = _full(b"iinf", 0, 0, (1).to_bytes(2, "big") + infe)
    pitm = _full(b"pitm", 0, 0, (1).to_bytes(2, "big"))
    ipco = _box(b"ipco", b"")
    ipma = _full(b"ipma", 0, 0, (0).to_bytes(4, "big"))
    iprp = _box(b"iprp", ipco + ipma)
    meta = _full(b"meta", 0, 0, pitm + iinf + iprp)
    with pytest.raises(ValueError, match="no ispe"):
        heif_meta_walk(ftyp + meta)


def test_decode_image_routes_heif_to_honest_class():
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_image)

    b = heif_encode_fixture("avif", 10, 10)
    assert is_heif(b)
    with pytest.raises(NotImplementedError, match="AVIF/HEIF"):
        decode_image(b)


def test_fuzz_never_wrong_only_deadletter():
    rng = random.Random(118)
    blobs = [
        heif_encode_fixture("avif", 320, 240, alpha=True, exif=True),
        heif_encode_fixture("heic", 64, 48, grid_tiles=3, bit_depth=10),
    ]
    for b in blobs:
        base = heif_meta_walk(b)
        for _ in range(1500):
            bb = bytearray(b)
            for _f in range(rng.randint(1, 3)):
                bb[rng.randrange(len(bb))] = rng.randrange(256)
            try:
                heif_meta_walk(bytes(bb))
            except (ValueError, NotImplementedError):
                pass
        for cut in range(1, len(b), 5):
            try:
                heif_meta_walk(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        assert heif_meta_walk(b) == base


def test_spark_plumbing_and_closed_form(spark):
    from postgres_debezium_clickhouse_spark.operators.heif import (
        heif_metadata, synth_heif_docs)

    ids = spark.range(0, 60, 1, 4).withColumnRenamed("id", "doc_id")
    out = heif_metadata(synth_heif_docs(ids)).collect()
    assert len(out) == 60
    for r in out:
        d = r["doc_id"]
        assert r["brand"] == ("avif" if d % 2 == 0 else "heic")
        assert r["width"] == 64 * (1 + d % 5)
        assert r["height"] == 48 * (1 + d % 4)
        assert r["bit_depth"] == [8, 10, 12][d % 3]
        assert r["has_alpha"] == (d % 3 == 0)
        assert r["has_exif"] == (d % 4 == 0)
        assert r["n_grid_tiles"] == ((2 + d % 3) if d % 7 == 0 else 0)
        assert r["primary_type"] == (
            "grid" if d % 7 == 0
            else ("av01" if d % 2 == 0 else "hvc1"))


def test_iref_before_iinf_box_order():
    # r18 self-review: ISO 23008-12 does not mandate child order —
    # cdsc/Exif resolution must not depend on iinf preceding iref
    b = heif_encode_fixture("avif", 64, 48, exif=True)
    # rebuild the meta box with iref moved to the FRONT of its children
    meta_off = b.index(b"meta") - 4
    meta_size = int.from_bytes(b[meta_off:meta_off + 4], "big")
    meta_payload = b[meta_off + 12:meta_off + meta_size]  # skip fullbox
    children = []
    p = 0
    while p < len(meta_payload):
        size = int.from_bytes(meta_payload[p:p + 4], "big")
        children.append(meta_payload[p:p + size])
        p += size
    iref = [c for c in children if c[4:8] == b"iref"]
    rest = [c for c in children if c[4:8] != b"iref"]
    assert iref
    new_payload = b"".join(iref + rest)
    new_meta = (meta_size).to_bytes(4, "big") + b"meta" \
        + b[meta_off + 8:meta_off + 12] + new_payload
    blob = b[:meta_off] + new_meta + b[meta_off + meta_size:]
    m = heif_meta_walk(blob)
    assert m["has_exif"] is True
    assert heif_meta_walk(b) == m
