"""MDArray chunked N-D ops vs whole-array numpy oracles.

Reference semantics: gcore/multidim/gdalmultidim_array_view.cpp (slice),
gdalmultidim_array_transposed.cpp (transpose),
gdalmultidim_abstract_array.cpp:1441 (GetStatistics),
apps/gdalmdimtranslate_lib.cpp (subset+transpose translate).
"""

import numpy as np
import pytest

from gdal_spark import multidim as MD


# lambdas, not module-level defs: cloudpickle must serialize them by value
# (the tests package is not importable on executor workers)
_fn = lambda i, j, k: ((i * 7919 + j * 104729 + k * 1299709) % 100003) / 100.0  # noqa: E731
_fn2 = lambda i, j: ((i * 31 + j * 17) % 997) / 10.0  # noqa: E731


@pytest.fixture(scope="module")
def cube(spark):
    md = MD.create(spark, (30, 25, 19), (8, 8, 8), _fn)
    i, j, k = np.meshgrid(
        np.arange(30), np.arange(25), np.arange(19), indexing="ij"
    )
    return md, _fn(i.astype(np.int64), j.astype(np.int64), k.astype(np.int64))


def test_create_roundtrip(spark, cube):
    md, ref = cube
    np.testing.assert_array_equal(md.collect_numpy(), ref)
    assert md.grid() == (4, 4, 3)


@pytest.mark.parametrize(
    "starts,stops",
    [
        ((0, 0, 0), (30, 25, 19)),       # identity
        ((8, 8, 8), (16, 16, 16)),       # chunk-aligned
        ((3, 5, 2), (27, 22, 17)),       # unaligned, crosses boundaries
        ((9, 1, 18), (10, 2, 19)),       # single cell
    ],
)
def test_slice(spark, cube, starts, stops):
    md, ref = cube
    sl = MD.slice_view(md, starts, stops)
    expect = ref[tuple(slice(a, b) for a, b in zip(starts, stops))]
    assert sl.shape == expect.shape
    np.testing.assert_array_equal(sl.collect_numpy(), expect)


def test_slice_prunes_chunks(spark, cube):
    md, _ = cube
    # slice inside one chunk: the scan filter keeps exactly 1 of 48 chunks
    sl = MD.slice_view(md, (1, 2, 1), (7, 6, 5))
    assert sl.df.count() == 1  # one output chunk assembled from one input


@pytest.mark.parametrize("axes", [(2, 0, 1), (1, 0, 2), (2, 1, 0)])
def test_transpose(spark, cube, axes):
    md, ref = cube
    tr = MD.transpose(md, axes)
    assert tr.shape == tuple(ref.transpose(axes).shape)
    np.testing.assert_array_equal(tr.collect_numpy(), ref.transpose(axes))


def test_transpose_has_no_shuffle(spark, cube):
    md, _ = cube
    # sparkPlan (pre-AQE physical plan) prints once for executed and
    # unexecuted queries alike, so the counts are comparable
    base = md.df._jdf.queryExecution().sparkPlan().toString()
    plan = MD.transpose(md, (2, 0, 1)).df._jdf.queryExecution().sparkPlan().toString()
    # transpose adds ZERO exchanges on top of the generator's repartition
    assert plan.count("Exchange") == base.count("Exchange") == 1


@pytest.mark.parametrize("axis,op", [(0, "sum"), (1, "mean"), (2, "min"), (0, "max")])
def test_reduce(spark, cube, axis, op):
    md, ref = cube
    red = MD.reduce(md, axis, op)
    expect = getattr(np, op)(ref, axis=axis)
    assert red.shape == expect.shape
    np.testing.assert_allclose(red.collect_numpy(), expect, rtol=1e-12)


def test_statistics(spark, cube):
    md, ref = cube
    row = MD.statistics(md).collect()[0]
    assert row.n == ref.size
    assert row.min_v == ref.min() and row.max_v == ref.max()
    np.testing.assert_allclose(row.mean_v, ref.mean(), rtol=1e-12)
    np.testing.assert_allclose(row.std_v, ref.std(), rtol=1e-9)


def test_elementwise(spark):
    import pyspark

    spark_ = pyspark.sql.SparkSession.getActiveSession()
    md = MD.create(spark_, (13, 11), (5, 4), _fn2)
    out = MD.elementwise(md, lambda v: v * 2.0 + 1.0)
    i, j = np.meshgrid(np.arange(13), np.arange(11), indexing="ij")
    ref = _fn2(i.astype(np.int64), j.astype(np.int64)) * 2.0 + 1.0
    np.testing.assert_array_equal(out.collect_numpy(), ref)


def test_translate_pipeline(spark, cube):
    """gdal mdim convert shape: slice -> transpose -> reduce, composed."""
    md, ref = cube
    out = MD.reduce(
        MD.transpose(MD.slice_view(md, (3, 5, 2), (27, 21, 18)), (2, 0, 1)),
        axis=1,
        op="mean",
    )
    expect = ref[3:27, 5:21, 2:18].transpose(2, 0, 1).mean(axis=1)
    np.testing.assert_allclose(out.collect_numpy(), expect, rtol=1e-12)


def test_to_rows(spark):
    import pyspark

    spark_ = pyspark.sql.SparkSession.getActiveSession()
    md = MD.create(spark_, (6, 5), (4, 3), _fn2)
    pdf = MD.to_rows(md).toPandas().sort_values(["i0", "i1"]).reset_index(drop=True)
    i, j = np.meshgrid(np.arange(6), np.arange(5), indexing="ij")
    ref = _fn2(i.astype(np.int64), j.astype(np.int64))
    assert len(pdf) == 30
    np.testing.assert_array_equal(
        pdf["v"].to_numpy().reshape(6, 5), ref
    )


def test_zarr_bridge_roundtrip(spark, tmp_path):
    """MDArray -> Zarr V2 store (executor-written chunks) -> MDArray;
    verified against a single-process zarr read and per-axis reduces."""
    import numpy as np

    from gdal_spark import multidim as MD
    from gdal_spark.sources import zarr as Z

    md = MD.create(
        spark, (9, 14), (4, 5),
        lambda i, j: (i * 37 + j * 101) % 97,
        dims=("y", "x"),
    )
    p = str(tmp_path / "cube.zarr")
    MD.to_zarr(md, p)

    arr, info = Z.read_zarr_array(p)
    i, j = np.meshgrid(np.arange(9), np.arange(14), indexing="ij")
    exp = ((i * 37 + j * 101) % 97).astype(np.float64)
    assert np.array_equal(arr, exp)
    assert info["attrs"]["_ARRAY_DIMENSIONS"] == ["y", "x"]

    md2 = MD.from_zarr(spark, p)
    assert md2.shape == (9, 14) and md2.dims == ("y", "x")
    got = MD.reduce(md2, 0, "sum")
    full = np.zeros(14)
    for r in MD.to_rows(got).collect():
        full[r["i0"]] = r["v"]
    assert np.allclose(full, exp.sum(axis=0))
