"""Spatial joins: PIP (inner/semi/anti) and per-tile kNN vs independent
oracles. Join rows must match exactly (north rule: "matching the
reference's join output rows")."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rio_cogeo_ray import fixtures
from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.functions.geocode import geocode_url
from rio_cogeo_ray.stages import assign, knn, pip


def _prepared_ds(scenario: str, zoom: int = 6):
    spec = fixtures.scenario_spec(scenario)
    path = fixtures.scenario_path(scenario)
    ds = rd.read_parquet(path, columns=["url"])
    prepare = assign.make_prepare_fn(spec, zoom, extract=False, source="pages")
    return ds.map_batches(prepare, batch_format="pyarrow", batch_size=700), spec


def _prepared_pdf(scenario: str, zoom: int = 6) -> pd.DataFrame:
    """Driver-side oracle prepare (independent composition)."""
    t = fixtures.scenario_table(scenario)
    lon, lat, valid = geocode_url(t["url"].combine_chunks(), fixtures.scenario_spec(scenario))
    mx, my = tms.lonlat_to_mercator(lon, lat)
    x, y = tms.mercator_tile(mx, my, zoom)
    return pd.DataFrame(
        {
            "url": t["url"].to_pylist(),
            "lon": lon,
            "lat": lat,
            "mx": mx,
            "my": my,
            "tile_key": tms.pack_tile_key(zoom, x, y),
            "x": x,
            "y": y,
            "valid": valid,
        }
    )


def _wn_inside(px, py, lons, lats):
    """Winding-number PIP — deliberately a DIFFERENT algorithm than the
    engine's even-odd ray casting; on-edge ⇒ inside."""
    wn = 0
    n = len(lons)
    for i in range(n):
        x1, y1 = lons[i], lats[i]
        x2, y2 = lons[(i + 1) % n], lats[(i + 1) % n]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if (
            cross == 0.0
            and min(x1, x2) <= px <= max(x1, x2)
            and min(y1, y2) <= py <= max(y1, y2)
        ):
            return True
        if y1 <= py:
            if y2 > py and cross > 0:
                wn += 1
        elif y2 <= py and cross < 0:
            wn -= 1
    return wn != 0


@pytest.mark.parametrize("aoi_set", ["rect", "hex"])
def test_pip_inner_matches_winding_oracle(ray_session, aoi_set):
    aois = fixtures.aois_table(
        fixtures.RECT_AOIS if aoi_set == "rect" else fixtures.HEX_AOIS
    )
    ds, _ = _prepared_ds("pages_aoi")
    out = pip.pip_join(ds, aois, mode="inner", concurrency=2).to_pandas()

    pdf = _prepared_pdf("pages_aoi")
    pdf = pdf[pdf["valid"]]
    expect = set()
    for _, a in aois.to_pandas().iterrows():
        lons = np.asarray(a["ring_lon"])
        lats = np.asarray(a["ring_lat"])
        for url, lo, la in zip(pdf["url"], pdf["lon"], pdf["lat"]):
            if _wn_inside(lo, la, lons, lats):
                expect.add((url, a["aoi_id"]))
    got = set(zip(out["url"], out["aoi_id"]))
    assert got == expect
    assert len(got) > 0


def test_pip_semi_anti_partition(ray_session):
    """semi ∪ anti = all valid rows; semi ∩ anti = ∅."""
    aois = fixtures.aois_table(fixtures.RECT_AOIS)
    ds, _ = _prepared_ds("pages_aoi")
    semi = pip.pip_join(ds, aois, mode="semi", concurrency=2).to_pandas()
    ds2, _ = _prepared_ds("pages_aoi")
    anti = pip.pip_join(ds2, aois, mode="anti", concurrency=2).to_pandas()
    pdf = _prepared_pdf("pages_aoi")
    n_valid = int(pdf["valid"].sum())
    assert len(semi) + len(anti) == n_valid
    assert set(semi["url"]).isdisjoint(set(anti["url"]))


def test_pip_edge_point_is_inside(ray_session):
    """Tie rule: a point exactly on a polygon edge joins (inclusive)."""
    aois = fixtures.aois_table([fixtures.RECT_AOIS[0]])  # (-10,35)-(30,60)
    t = pa.table(
        {
            "url": ["edge-w", "corner-sw", "inside", "outside"],
            "lon": [-10.0, -10.0, 0.0, 31.0],
            "lat": [40.0, 35.0, 40.0, 40.0],
            "geo_valid": [True, True, True, True],
        }
    )
    ds = rd.from_arrow(t)
    out = pip.pip_join(ds, aois, mode="inner", concurrency=1).to_pandas()
    assert set(out["url"]) == {"edge-w", "corner-sw", "inside"}


def test_knn_per_tile_matches_pandas_oracle(ray_session):
    k = 5
    ds, _ = _prepared_ds("pages_knn")
    got = knn.knn_per_tile(ds, k=k, id_col="url").to_pandas()

    pdf = _prepared_pdf("pages_knn")
    pdf = pdf[pdf["valid"]].copy()
    cx, cy = tms.tile_centroid(6, pdf["x"].to_numpy(), pdf["y"].to_numpy())
    dx = pdf["mx"].to_numpy() - cx
    dy = pdf["my"].to_numpy() - cy
    pdf["centroid_d2"] = dx * dx + dy * dy
    expect = (
        pdf.sort_values(["tile_key", "centroid_d2", "url"])
        .groupby("tile_key")
        .head(k)
    )
    key = lambda df: sorted(zip(df["tile_key"], df["url"]))
    assert key(got) == key(expect)
    # every returned distance matches the oracle value bit-for-bit
    g = got.sort_values(["tile_key", "url"]).reset_index()
    e = expect.sort_values(["tile_key", "url"]).reset_index()
    np.testing.assert_array_equal(
        g["centroid_d2"].to_numpy(), e["centroid_d2"].to_numpy()
    )


def test_per_group_topk_skewed_group(ray_session):
    """One giant group (skew): batch-local pre-reduction keeps the final
    group small; result still exact."""
    n = 20000
    rng = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "g": np.where(rng % 10 == 0, 1, rng % 7 + 2).astype(np.int64),
            "score": (rng * 2654435761 % 97).astype(np.float64),
            "id": rng,
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    out = knn.per_group_topk(ds, "g", [("score", True), ("id", True)], 3).to_pandas()
    expect = (
        t.to_pandas()
        .sort_values(["g", "score", "id"])
        .groupby("g")
        .head(3)
    )
    assert sorted(zip(out["g"], out["id"])) == sorted(zip(expect["g"], expect["id"]))


def test_pip_grid_index_many_polygons():
    """Grid-indexed PIP == brute-force per-polygon scan on a 1k-polygon
    layer, and the index prunes candidates to a small fraction of the
    layer (the sub-quadratic claim, checked structurally)."""
    import numpy as np
    import pyarrow as pa

    from rio_cogeo_ray.stages.pip import PIPJoin, _GridIndex, _build_polygons

    rng = np.random.RandomState(7)
    P, N = 1000, 5000
    cx = rng.uniform(-170, 170, P)
    cy = rng.uniform(-80, 80, P)
    w = rng.uniform(0.5, 3.0, P)
    h = rng.uniform(0.5, 3.0, P)
    aois = pa.table(
        {
            "aoi_id": pa.array(np.arange(P, dtype=np.int32), pa.int32()),
            "ring_lon": pa.array(
                [[x - a, x + a, x + a, x - a] for x, a in zip(cx, w)],
                pa.list_(pa.float64()),
            ),
            "ring_lat": pa.array(
                [[y - b, y - b, y + b, y + b] for y, b in zip(cy, h)],
                pa.list_(pa.float64()),
            ),
        }
    )
    px = rng.uniform(-180, 180, N)
    py = rng.uniform(-85, 85, N)
    batch = pa.table(
        {
            "pid": pa.array(np.arange(N, dtype=np.int64)),
            "lon": pa.array(px, pa.float64()),
            "lat": pa.array(py, pa.float64()),
        }
    )

    j = PIPJoin(aois, mode="inner")
    got = j(batch)

    # brute force oracle: every polygon against every point
    polys = _build_polygons(aois)
    pairs = []
    for p in polys:
        for i in np.flatnonzero(p.contains(px, py)):
            pairs.append((int(i), int(p.aoi_id)))
    pairs.sort()
    assert list(zip(got["pid"].to_pylist(), got["aoi_id"].to_pylist())) == [
        (int(i), a) for i, a in pairs
    ]

    # pruning is real: candidate pairs ≪ P·N
    idx = _GridIndex(polys)
    pi, pj = idx.candidate_pairs(px, py)
    assert len(pi) < P * N / 50

    # semi + anti partition the batch
    semi = PIPJoin(aois, mode="semi")(batch)
    anti = PIPJoin(aois, mode="anti")(batch)
    assert len(semi) + len(anti) == N
    assert set(semi["pid"].to_pylist()) == {i for i, _ in pairs}


def test_broadcast_range_join_semantics(ray_session):
    """[lo, hi) interval containment: boundary rules, semi/anti
    partition, overlap rejection."""
    import pyarrow as pa

    import ray.data as rd

    from rio_cogeo_ray.stages import join as join_mod

    bands = pa.table(
        {
            "band": pa.array(["a", "b"], pa.string()),
            "lo": pa.array([0.0, 10.0], pa.float64()),
            "hi": pa.array([10.0, 20.0], pa.float64()),
        }
    )
    t = pa.table({"v": pa.array([-1.0, 0.0, 9.999, 10.0, 19.999, 20.0], pa.float64())})
    got = join_mod.broadcast_range_join(
        rd.from_arrow(t), bands, value_col="v", concurrency=1
    ).to_pandas().sort_values("v")
    assert got["v"].tolist() == [0.0, 9.999, 10.0, 19.999]
    assert got["band"].tolist() == ["a", "a", "b", "b"]

    semi = join_mod.broadcast_range_join(
        rd.from_arrow(t), bands, value_col="v", mode="semi", concurrency=1
    ).to_pandas()
    anti = join_mod.broadcast_range_join(
        rd.from_arrow(t), bands, value_col="v", mode="anti", concurrency=1
    ).to_pandas()
    assert len(semi) + len(anti) == len(t)
    assert sorted(anti["v"]) == [-1.0, 20.0]

    overlapping = pa.table(
        {
            "band": pa.array(["a", "b"]),
            "lo": pa.array([0.0, 5.0], pa.float64()),
            "hi": pa.array([10.0, 20.0], pa.float64()),
        }
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        join_mod.RangeLookup(overlapping, "v")


def test_bucketed_join_composite_key(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from rio_cogeo_ray.stages import join as join_mod

    rng = np.random.RandomState(9)
    n = 500
    left = pa.table(
        {
            "a": pa.array(rng.randint(0, 12, n).astype(np.int64)),
            "b": pa.array(rng.randint(0, 7, n).astype(np.int64)),
            "lv": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "a": pa.array(rng.randint(0, 12, 200).astype(np.int64)),
            "b": pa.array(rng.randint(0, 7, 200).astype(np.int64)),
            "rv": pa.array(np.arange(200, dtype=np.int64) * 10),
        }
    )
    got = (
        join_mod.bucketed_hash_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            on=["a", "b"],
            how="inner",
        )
        .to_pandas()
        .sort_values(["a", "b", "lv", "rv"])
        .reset_index(drop=True)
    )
    expect = (
        left.to_pandas()
        .merge(right.to_pandas(), on=["a", "b"], how="inner")
        .sort_values(["a", "b", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["a", "b", "lv", "rv"]], expect[["a", "b", "lv", "rv"]])


def test_bucketed_join_composite_anti(ray_session):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from rio_cogeo_ray.stages import join as join_mod

    left = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "b": pa.array([0, 1, 0, 1, 0], pa.int64()),
            "v": pa.array([10, 11, 20, 21, 30], pa.int64()),
        }
    )
    right = pa.table(
        {
            "a": pa.array([1, 2], pa.int64()),
            "b": pa.array([1, 0], pa.int64()),
        }
    )
    got = (
        join_mod.bucketed_hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on=["a", "b"], how="anti"
        )
        .to_pandas()
        .sort_values("v")["v"]
        .tolist()
    )
    assert got == [10, 21, 30]


def test_set_op_intersect_except(ray_session):
    """INTERSECT/EXCEPT (stages/setops.py) vs python sets: DISTINCT
    semantics (input duplicates collapse), composite string+int keys,
    and the empty-side paths."""
    from rio_cogeo_ray.stages import setops

    left = pa.table(
        {
            "k": pa.array(["a", "a", "b", "c", "c", "d"], pa.string()),
            "g": pa.array([1, 1, 2, 3, 3, 4], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["b", "c", "c", "e"], pa.string()),
            "g": pa.array([2, 3, 99, 5], pa.int64()),
        }
    )
    l, r = rd.from_arrow(left), rd.from_arrow(right)

    inter = setops.set_op(l, r, on=["k", "g"], op="intersect").to_pandas()
    got = sorted(map(tuple, inter[["k", "g"]].itertuples(index=False)))
    # distinct left = {(a,1),(b,2),(c,3),(d,4)}; right has (b,2),(c,3)
    assert got == [("b", 2), ("c", 3)]

    exc = setops.set_op(l, r, on=["k", "g"], op="except").to_pandas()
    got = sorted(map(tuple, exc[["k", "g"]].itertuples(index=False)))
    assert got == [("a", 1), ("d", 4)]

    # single string key
    inter1 = setops.set_op(l, r, on="k", op="intersect").to_pandas()
    assert sorted(inter1["k"]) == ["b", "c"]

    # empty right: intersect empty, except = distinct left
    e = rd.from_arrow(left.slice(0, 0)).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    assert setops.set_op(l, e, on=["k", "g"], op="intersect").count() == 0
    assert setops.set_op(l, e, on=["k", "g"], op="except").count() == 4
    # empty left: both ops empty
    assert setops.set_op(e, r, on=["k", "g"], op="intersect").count() == 0
    assert setops.set_op(e, r, on=["k", "g"], op="except").count() == 0

    with pytest.raises(ValueError):
        setops.set_op(l, r, on="k", op="union")


def test_auto_join_planner(ray_session):
    """auto_join picks broadcast / salted / bucketed from the key-skew
    probes, and every chosen path returns exactly the bucketed join's
    rows (the choice is physical, never semantic)."""
    from rio_cogeo_ray.stages import join as join_mod

    rng = np.random.RandomState(3)
    n = 3000
    # skewed left: key 7 carries ~60% of rows
    keys = np.where(rng.rand(n) < 0.6, 7, rng.randint(0, 40, n)).astype(np.int64)
    left = pa.table(
        {
            "k": pa.array(keys),
            "lid": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    dim = pa.table(
        {
            "k": pa.array(np.arange(40, dtype=np.int64)),
            "name": pa.array([f"d{i}" for i in range(40)]),
        }
    )
    # fan-out right side (duplicate keys) -> never broadcast
    fan = pa.table(
        {
            "k": pa.array(np.repeat(np.arange(40, dtype=np.int64), 3)),
            "tag": pa.array([f"t{i}" for i in range(120)]),
        }
    )
    lds = rd.from_arrow(left).repartition(4)

    def rows(ds):
        return sorted(
            tuple(sorted(r.items())) for r in ds.take_all()
        )

    # 1. small unique right side -> broadcast
    out, plan = join_mod.auto_join(lds, rd.from_arrow(dim), on="k")
    assert plan["strategy"] == "broadcast" and plan["right_unique"]
    expect = rows(
        join_mod.bucketed_hash_join(lds, rd.from_arrow(dim), on="k", how="inner")
    )
    assert rows(out) == expect

    # 2. duplicate-keyed right + hot left key -> salted (salt col given)
    out2, plan2 = join_mod.auto_join(
        lds, rd.from_arrow(fan), on="k", salt_source_col="lid",
        broadcast_max_rows=10, hot_threshold=1000,
    )
    assert plan2["strategy"] == "salted"
    assert plan2["left_max_multiplicity"] > 1000
    expect2 = rows(
        join_mod.bucketed_hash_join(lds, rd.from_arrow(fan), on="k", how="inner")
    )
    assert rows(out2) == expect2

    # 3. same but WITHOUT a salt column -> documented bucketed fallback
    out3, plan3 = join_mod.auto_join(
        lds, rd.from_arrow(fan), on="k",
        broadcast_max_rows=10, hot_threshold=1000,
    )
    assert plan3["strategy"] == "bucketed" and plan3.get("note") == "no salt_source_col"
    assert rows(out3) == expect2

    # 4. no hot keys, big-ish unique right over the broadcast cap -> bucketed
    out4, plan4 = join_mod.auto_join(
        lds, rd.from_arrow(dim), on="k",
        broadcast_max_rows=10, hot_threshold=10_000_000,
    )
    assert plan4["strategy"] == "bucketed"
    assert rows(out4) == expect

    # 5. semi mode through the planner (broadcast-eligible)
    out5, plan5 = join_mod.auto_join(lds, rd.from_arrow(dim), on="k", how="semi")
    assert plan5["strategy"] == "broadcast"
    assert rows(out5) == rows(
        join_mod.bucketed_hash_join(lds, rd.from_arrow(dim), on="k", how="semi")
    )


def test_broadcast_lpm_join_semantics(ray_session):
    """broadcast_lpm_join: the LONGEST matching prefix wins (a broad
    rule is shadowed by a more specific one), non-matches stay NULL,
    multibyte keys slice on codepoints, and the rule-count guard
    raises; layout-invariant."""
    from rio_cogeo_ray.stages import join as join_mod

    rules = pa.table(
        {
            "prefix": pa.array(
                ["https://a", "https://a.example/p", "https://b", "ü-rule"],
                pa.string(),
            )
        }
    )
    keys = [
        "https://a.example/p/1",   # both 'https://a' rules match -> longest
        "https://a.other/x",       # only the broad rule
        "https://b",               # exact == prefix
        "https://c/none",          # no match -> NULL
        "ü-rule-suffix",           # multibyte prefix
        "",                        # empty key -> NULL
    ]
    t = pa.table({"url": pa.array(keys, pa.string())})
    want = [
        "https://a.example/p",
        "https://a",
        "https://b",
        None,
        "ü-rule",
        None,
    ]
    for parts in (1, 3):
        out = join_mod.broadcast_lpm_join(
            rd.from_arrow(t).repartition(parts), rules
        ).to_pandas()
        got = dict(zip(out.url, out.rule.where(out.rule.notna(), None)))
        assert got == dict(zip(keys, want))

    with pytest.raises(ValueError, match="max_rules"):
        join_mod.broadcast_lpm_join(rd.from_arrow(t), rules, max_rules=2)

    # an empty-string rule would match EVERY row under the SQL
    # starts_with mirror — the engine must refuse, not silently skip;
    # a NULL rule matches nothing in SQL too and is skipped quietly
    bad = pa.table({"prefix": pa.array(["https://a", ""], pa.string())})
    with pytest.raises(ValueError, match="empty-string prefix"):
        join_mod.broadcast_lpm_join(rd.from_arrow(t), bad)
    with_null = pa.table({"prefix": pa.array(["https://a", None], pa.string())})
    out = join_mod.broadcast_lpm_join(rd.from_arrow(t), with_null).to_pandas()
    assert out.rule.notna().sum() == 2  # the two 'https://a' matches
