"""Image resize plumbing (ops/multimodal.image_resize): exact
nearest-neighbor grid on crafted payloads, null/empty paths, and
partitioning invariance of the integer coordinate map."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.multimodal import image_resize


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="resize-test")


SCHEMA = ("doc_id long, payload binary, width int, height int, "
          "format string")


def test_hand_computed_grid(spark):
    # 16-byte payload 0..15; 8x6 source -> 4x3 output.
    # y_i = (i*6)//3 = [0, 2, 4]; x_j = (j*8)//4 = [0, 2, 4, 6]
    # pixel = (y*8 + x) % 16 -> rows: [0,2,4,6], [0,2,4,6]... since
    # y=2 -> 16+x mod 16 = x; y=4 -> 32+x mod 16 = x
    df = spark.createDataFrame(
        [(1, bytes(range(16)), 8, 6, "png")], SCHEMA)
    r = image_resize(df).collect()[0]
    assert r.pixels == [0, 2, 4, 6] * 3
    assert (r.width, r.height) == (8, 6)


def test_nontrivial_wrap(spark):
    # 4-byte payload, 3x3 source -> indices (y*3+x) % 4
    df = spark.createDataFrame(
        [(1, bytes([10, 20, 30, 40]), 3, 3, "png")], SCHEMA)
    r = image_resize(df).collect()[0]
    # y_i = (i*3)//3 = [0,1,2]; x_j = (j*3)//4 = [0,0,1,2]
    idx = [(y * 3 + x) % 4 for y in (0, 1, 2) for x in (0, 0, 1, 2)]
    assert r.pixels == [[10, 20, 30, 40][k] for k in idx]


def test_null_and_empty_payload(spark):
    df = spark.createDataFrame(
        [(1, None, 8, 6, "png"), (2, b"", 8, 6, "png"),
         (3, bytes(16), 0, 6, "png")], SCHEMA)
    got = {r.doc_id: r.pixels for r in image_resize(df).collect()}
    assert got == {1: [], 2: [], 3: []}


def test_partitioning_invariance(spark):
    rows = [(i, bytes([i % 256] * 16), 1 + i % 64, 1 + i % 48, "png")
            for i in range(1, 60)]
    df = spark.createDataFrame(rows, SCHEMA)
    one = sorted(map(tuple, image_resize(df.repartition(1)).collect()))
    many = sorted(map(tuple, image_resize(df.repartition(7)).collect()))
    assert one == many


def test_real_png_path_decodes_true_pixels(spark):
    # a REAL PNG whose decoded grid disagrees with the stub's modular
    # map: payload pixels are (y*w + x) * 3 % 251 over a 10x8 grid.
    # If resize took the stub path the values would be payload BYTES
    # (PNG file bytes), not pixels — only a correct decode matches.
    import numpy as np
    from swiftsoup_spark.ops.png import encode_png
    h, w = 8, 10
    grid = ((np.arange(h * w).reshape(h, w) * 3) % 251).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, encode_png(grid), w, h, "png")], SCHEMA)
    r = image_resize(df).collect()[0]
    ys = [(i * h) // 3 for i in range(3)]
    xs = [(j * w) // 4 for j in range(4)]
    assert r.pixels == [int(grid[y, x]) for y in ys for x in xs]


def test_image_meta_parses_ihdr_over_metadata(spark):
    # metadata columns LIE (w=1,h=1,'jpeg'); IHDR says 10x8 — the
    # parsed path must win for real PNG payloads
    import numpy as np
    from swiftsoup_spark.ops.multimodal import image_meta
    from swiftsoup_spark.ops.png import encode_png
    png = encode_png(np.zeros((8, 10), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, png, 1, 1, "jpeg"), (2, b"\xff\xd8notapng", 5, 6, "jpeg")],
        SCHEMA)
    got = {r.doc_id: (r.width, r.height, r.format, r.parsed)
           for r in image_meta(df).collect()}
    assert got[1] == (10, 8, "png", True)
    assert got[2] == (5, 6, "jpeg", False)
