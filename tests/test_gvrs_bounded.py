"""Driver-bounded single-file directory + update (round-5 verdict #2).

A store whose tile directory has >10^6 entries (the shape of the reference's
233M-tile envelope, GvrsFileSpecification.java:426-431) must open and
window-read WITHOUT materializing the position grid on the driver:

- parse_gvrs_header(load_directory=False) reads only the 24-byte directory
  header (GvrsTileDirectory pager);
- a window read range-reads only the directory pages covering the window's
  tile rows/cols (bytes_read asserted ~KB against the ~8.8 MB directory);
- update_gvrs plans the pass-through/merge split as anti-/semi-joins of the
  delta's tile ids against executor-paged directory rows — no driver
  collect of the changed set.
"""

from __future__ import annotations

import numpy as np
import pytest

from gridfour_spark import gvrsfile as G
from gridfour_spark.spec import GridSpec

# 1100 x 1000 tile grid = 1.1M directory entries; tiles 8x8 -> 8800x8000 grid
TR, TC = 8, 8
NROT, NCOT = 1100, 1000
SPEC = GridSpec(
    n_rows=NROT * TR, n_cols=NCOT * TC, n_rows_in_tile=TR, n_cols_in_tile=TC
)

# live tiles at the four directory corners (forces the full bbox) plus a
# few interior ones — everything else is absent (all-fill)
LIVE_TILES = sorted(
    {
        0,
        NCOT - 1,
        (NROT - 1) * NCOT,
        NROT * NCOT - 1,
        5 * NCOT + 7,
        517 * NCOT + 311,
        900 * NCOT + 450,
    }
)


def _tile_value(ti: int, pos: int) -> int:
    return ti * 100 + pos


def _make_store(path: str, extended: bool) -> None:
    e = G.default_element("z", "int")
    rows = []
    for ti in LIVE_TILES:
        vals = np.array(
            [_tile_value(ti, p) for p in range(TR * TC)], dtype="<i4"
        )
        rows.append({"tile_index": ti, "block": vals.tobytes()})
    G.write_gvrs(
        path, SPEC, e, rows, compressed=False, extended_directory=extended
    )


@pytest.fixture(scope="module")
def big_store(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("bounded") / "big.gvrs")
    _make_store(p, extended=True)
    return p


def test_bounded_open_reads_no_directory_pages(big_store):
    info = G.parse_gvrs_header(big_store, load_directory=False)
    d = info.directory
    assert info.tile_positions == {}
    assert d is not None and d.extended
    assert d.n_entries == NROT * NCOT
    # open cost: the 24-byte directory header only
    assert d.bytes_read == 24
    full_size = d.n_entries * d.stride
    assert full_size > 8_000_000  # the thing we must NOT read


def test_window_read_touches_only_covering_pages(big_store):
    info = G.parse_gvrs_header(big_store, load_directory=False)
    d = info.directory
    # window over the top-left live tile: cells [0,TR) x [0,TC)
    pos = d.positions_for_window(0, 0, 0, 0)
    assert list(pos) == [0]
    # window over the bottom-right corner
    pos2 = d.positions_for_window(NROT - 1, NROT - 1, NCOT - 1, NCOT - 1)
    assert list(pos2) == [NROT * NCOT - 1]
    # a 2x3-tile window with no live tiles
    assert d.positions_for_window(10, 11, 10, 12) == {}
    # total directory bytes fetched across all three windows: a few entries
    read = d.bytes_read - 24
    assert read < 1024, read
    assert read < (d.n_entries * d.stride) // 1000


def test_positions_for_tiles_is_request_bounded(big_store):
    info = G.parse_gvrs_header(big_store, load_directory=False)
    d = info.directory
    live, dead = LIVE_TILES[4], 42 * NCOT + 42
    pos = d.positions_for_tiles([live, dead])
    assert list(pos) == [live]
    assert d.bytes_read - 24 == 2 * d.stride


def test_windowed_cells_read_is_correct_and_bounded(spark, big_store):
    info = G.parse_gvrs_header(big_store, load_directory=False)
    ti = LIVE_TILES[4]  # 5*NCOT + 7 -> tile_row 5, tile_col 7
    tr, tc = divmod(ti, NCOT)
    r0, c0 = tr * TR, tc * TC
    cells = G.read_gvrs(
        spark,
        big_store,
        row_range=(r0, r0 + TR),
        col_range=(c0, c0 + TC),
        info=info,
    )
    rows = cells.collect()
    assert len(rows) == 1  # one tile row (single element)
    got = np.array(rows[0]["values"])
    want = np.array([_tile_value(ti, p) for p in range(TR * TC)], dtype=float)
    assert np.array_equal(got, want)
    # the plan only paged the window's directory entries
    assert info.directory.bytes_read - 24 < 1024


def test_full_scan_never_materializes_directory_on_driver(spark, big_store):
    # full scan goes through gvrs_directory_df: driver holds chunk specs,
    # executors page the directory. Every live tile must come back.
    tiles = G.read_gvrs(spark, big_store)
    got = sorted(r["tile_index"] for r in tiles.select("tile_index").collect())
    assert got == LIVE_TILES


def test_update_plans_without_changed_set_collect(spark, big_store, tmp_path):
    dst = str(tmp_path / "upd.gvrs")
    live_ti = LIVE_TILES[4]
    tr, tc = divmod(live_ti, NCOT)
    dead_ti = 77 * NCOT + 99
    dtr, dtc = divmod(dead_ti, NCOT)
    delta = spark.createDataFrame(
        [
            (tr * TR + 1, tc * TC + 2, 111111.0),  # overlay inside a live tile
            (dtr * TR + 3, dtc * TC + 4, 222222.0),  # allocates a dead tile
        ],
        "row long, col long, z double",
    )
    stats = G.update_gvrs(spark, big_store, dst, delta)
    assert stats["n_changed"] == 2
    assert stats["changed"] == sorted([live_ti, dead_ti])  # small -> ids kept
    assert stats["copied"] == len(LIVE_TILES) - 1  # live tile rewrote, dead was absent

    info2 = G.parse_gvrs_header(dst, load_directory=False)
    assert info2.directory.n_entries == NROT * NCOT  # bbox unchanged (corners live)
    # overlay applied, neighbors untouched, new tile allocated over fill
    win = G.gvrs_cells(
        spark, dst, row_range=(tr * TR, tr * TR + TR), col_range=(tc * TC, tc * TC + TC)
    ).collect()
    by_rc = {(r["row"], r["col"]): r["z"] for r in win}
    assert by_rc[(tr * TR + 1, tc * TC + 2)] == 111111.0
    assert by_rc[(tr * TR, tc * TC)] == _tile_value(live_ti, 0)
    new_cell = G.gvrs_cells(
        spark, dst,
        row_range=(dtr * TR + 3, dtr * TR + 4),
        col_range=(dtc * TC + 4, dtc * TC + 5),
    ).collect()
    assert len(new_cell) == 1 and new_cell[0]["z"] == 222222.0


def test_changed_ids_cap_suppresses_large_lists(spark, tmp_path):
    # tiny store, cap forced to 0: stats must carry counts, not ids
    p = str(tmp_path / "small.gvrs")
    spec = GridSpec(n_rows=16, n_cols=16, n_rows_in_tile=8, n_cols_in_tile=8)
    e = G.default_element("z", "int")
    vals = np.arange(64, dtype="<i4")
    G.write_gvrs(p, spec, e, [{"tile_index": 0, "block": vals.tobytes()}],
                 compressed=False)
    delta = spark.createDataFrame([(1, 1, 999.0)], "row long, col long, z double")
    stats = G.update_gvrs(spark, p, str(tmp_path / "o.gvrs"), delta,
                          changed_ids_cap=0)
    assert stats["changed"] is None and stats["n_changed"] == 1
