"""CLI — ``python -m rio_cogeo_ray.cli {create,validate,info}``.

Mirrors the reference's click CLI (rio_cogeo/scripts/cli.py:91-480):
same subcommand surface, same option semantics re-expressed for the
engine (profile presets, zoom/alignment knobs, strict validation,
``info --json``), plus the param-parser behaviors pinned by the
reference's tests (nodata-style 'nil/none/nada' tokens → cli.py:46-63,
threads 'all_cpus' → cli.py:66-81).

The CLI owns the Ray session (scripts own ray.init; the library never
calls it — driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _parse_threads(value: str) -> int:
    """'all_cpus'/'ALL_CPUS' or a positive int (ThreadsParamType analog,
    cli.py:66-81)."""
    if value.lower() == "all_cpus":
        return os.cpu_count() or 1
    n = int(value)
    if n <= 0:
        raise argparse.ArgumentTypeError("threads must be positive or 'all_cpus'")
    return n


def _parse_bidx(value: str):
    """'1,2,3' → band indexes (BdxParamType analog, cli.py:27-43): a
    comma-separated list of integers > 0. Band 1 is the page-count
    channel; bands 2..k+1 are the entries of the --weight-col list."""
    try:
        bands = [int(x) for x in value.split(",")]
        assert all(b > 0 for b in bands)
        return bands
    except (ValueError, AttributeError, AssertionError):
        raise argparse.ArgumentTypeError(
            "bidx must be a string of comma-separated integers (> 0), "
            "representing the band indexes."
        )


def _parse_invalid_policy(value: str) -> str:
    """NodataParamType analog (cli.py:46-63) over the engine's
    invalid-page policies: 'mask'/'drop' direct; the reference's nodata
    tokens map onto them — 'nan' (an explicit invalid marker: invalid
    pages are masked and counted in the manifest) → 'mask';
    'nil'/'none'/'nada' (no nodata tracking) → 'drop'; a float nodata
    value (a concrete invalid marker) → 'mask'."""
    v = value.lower()
    if v in ("mask", "drop"):
        return v
    if v == "nan":
        return "mask"
    if v in ("nil", "none", "nada"):
        return "drop"
    try:
        float(v)
        return "mask"
    except (TypeError, ValueError):
        raise argparse.ArgumentTypeError(
            f"{value} is not a valid nodata value."
        )


def _parse_boxes(value: str):
    """'w,s,e,n[,weight];...' → GeoSpec boxes (BdxParamType-style comma
    list parsing, cli.py:27-43)."""
    boxes = []
    for part in value.split(";"):
        nums = [float(v) for v in part.split(",")]
        if len(nums) == 4:
            nums.append(1.0)
        if len(nums) != 5:
            raise argparse.ArgumentTypeError(
                f"box must be 'w,s,e,n[,weight]', got {part!r}"
            )
        boxes.append((nums[0], nums[1], nums[2], nums[3], int(nums[4])))
    return boxes


def _ray_init(num_cpus: int):
    """Own the Ray session. Cluster-aware: under ``ray job submit`` the
    job runtime exports ``RAY_ADDRESS`` pointing at the cluster — the
    CLI connects to it (cluster resources are fixed by the cluster, so
    ``num_cpus`` is not forwarded). Anywhere else (including this
    sandbox, where RAY_ADDRESS=local is preset) it starts a local
    session sized by ``--threads``. This is the multi-node entry path
    the north rule names:

        ray job submit --working-dir . -- \\
            python -m rio_cogeo_ray.cli create IN OUT --zoom 8 ...
    """
    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr == "local":
            ray.init(
                address="local", num_cpus=num_cpus, include_dashboard=False,
                logging_level="ERROR",
            )
        else:
            # existing cluster (ray job submit / ray start): attach only
            ray.init(address=addr, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_create(args) -> int:
    from rio_cogeo_ray.functions.geocode import GLOBAL_UNIFORM, GeoSpec
    from rio_cogeo_ray.pipelines import create as create_mod
    from rio_cogeo_ray.pipelines.profiles import cog_profiles
    from rio_cogeo_ray.pipelines.spec import plan

    import warnings

    from rio_cogeo_ray import errors

    profile = cog_profiles.get(args.profile)
    if profile["lossy"]:
        # LossyCompression analog (rio_cogeo/errors.py:4-5): lossy
        # profiles quantize the density export
        warnings.warn(
            f"profile {args.profile!r} is lossy: dense exports quantize "
            "grid counts", errors.LossyCompression,
        )
    codec = profile["codec"] if profile["codec"] != "none" else None
    tile_px = args.blocksize or profile["tile_px"]
    geocode = GeoSpec(boxes=_parse_boxes(args.geocode_boxes)) if args.geocode_boxes else GLOBAL_UNIFORM
    if args.geocode_invalid:
        from dataclasses import replace as _dc_replace

        geocode = _dc_replace(geocode, invalid_per_65536=args.geocode_invalid)
    zoom = args.zoom
    if zoom is None and args.resolution is None:
        zoom = 7  # historical CLI default when neither knob is given
    tms_def = None
    if getattr(args, "tms", None):
        from rio_cogeo_ray.functions import tms as tms_mod

        try:
            tms_def = tms_mod.load_tms_json(args.tms)
        except (OSError, ValueError) as e:
            print(f"ERROR: --tms {args.tms}: {e}", file=sys.stderr)
            return 2
    try:
        spec = plan(
            zoom=zoom,
            resolution=args.resolution,
            zoom_level_strategy=args.zoom_level_strategy,
            aligned_levels=args.aligned_levels,
            overview_levels=args.overview_level,
            tile_px=tile_px,
            decimation_base=args.decimation_base,
            resampling=args.overview_resampling,
            geocode=geocode,
            invalid_policy=args.invalid_policy,
            tms_def=tms_def,
            overview_blocksize=args.overview_blocksize,
        )
    except errors.IncompatibleOptions as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 2
    # channel selection (--bidx, BdxParamType analog): band 1 is the
    # page-count channel, bands 2..k+1 the --weight-col entries.
    weight_cols = [c for c in (args.weight_col or "").split(",") if c]
    channels = [None] + weight_cols  # None = count channel
    if args.bidx:
        bad = [b for b in args.bidx if b > len(channels)]
        if bad:
            print(
                f"ERROR: bidx {bad} out of range: {len(channels)} channel(s) "
                f"available (1=count{''.join(f', {i+2}={c}' for i, c in enumerate(weight_cols))})",
                file=sys.stderr,
            )
            return 2
        selected = [channels[b - 1] for b in args.bidx]
    elif len(weight_cols) > 1:
        print(
            "ERROR: multiple --weight-col channels need --bidx to select "
            "which to build",
            file=sys.stderr,
        )
        return 2
    else:
        # legacy default: the weight channel when one is given, else count
        selected = [weight_cols[0]] if weight_cols else [None]
    _ray_init(args.threads)
    tags = dict(kv.split("=", 1) for kv in args.tag)
    band_tags = {}
    for bt in args.band_tag:
        band, kv = bt.split(":", 1)
        k, v = kv.split("=", 1)
        band_tags.setdefault(band, {})[k] = v
    colormap = json.loads(args.colormap) if args.colormap else None

    def _one(dst: str, wcol) -> dict:
        m = create_mod.create(
            args.src,
            dst,
            spec,
            source=args.source,
            weight_col=wcol,
            extract=args.extract,
            resume=not args.no_resume,
            codec=codec,
            tags=tags,
            band_tags=band_tags,
            colormap=colormap,
        )
        return {
            "out": dst,
            "band": wcol or "count",
            "levels": [(lv.z, lv.tiles, lv.pages) for lv in m.levels],
            "total_pages": m.total_pages,
            "invalid_pages": m.invalid_pages,
        }

    if len(selected) == 1:
        print(json.dumps(_one(args.dst, selected[0])))
    else:
        # one independently valid/info-able pyramid per selected channel
        outs = [
            _one(os.path.join(args.dst, f"band_{i}"), wcol)
            for i, wcol in zip(args.bidx, selected)
        ]
        print(json.dumps({"out": args.dst, "bands": outs}))
    import ray

    ray.shutdown()
    return 0


def cmd_append(args) -> int:
    """Incremental delta ingest (pipelines/create.py:append)."""
    from rio_cogeo_ray.pipelines import create as create_mod

    _ray_init(args.threads)
    m = create_mod.append(args.src, args.dst)
    print(
        json.dumps(
            {
                "out": args.dst,
                "levels": [(lv.z, lv.tiles, lv.pages) for lv in m.levels],
                "total_pages": m.total_pages,
                "invalid_pages": m.invalid_pages,
            }
        )
    )
    import ray

    ray.shutdown()
    return 0


def cmd_export(args) -> int:
    """Single-file pyramid export (the use_cog_driver alternate writer,
    reference cogeo.py:442-464)."""
    from rio_cogeo_ray.pipelines import create as create_mod

    _ray_init(args.threads)
    path = create_mod.export_cog(args.src, args.dst, row_group_tiles=args.row_group_tiles)
    import os

    import ray

    print(json.dumps({"out": path, "bytes": os.path.getsize(path)}))
    ray.shutdown()
    return 0


def cmd_prep(args) -> int:
    """Checkpoint-resumable web-prep chain (pipelines/prep.py): FILTER →
    DEDUP → SCORE with persisted stage boundaries. A killed run rerun
    with the same src+config resumes from the last completed boundary
    (the create() level-marker contract on the LLM chain); the scored
    corpus lands under WORK_DIR/stage=scored."""
    from rio_cogeo_ray.pipelines import prep
    from rio_cogeo_ray.state import checkpoint as ckpt

    _ray_init(args.threads)
    badwords = tuple(w for w in args.badwords.split(",") if w)
    scored = prep.web_prep(
        args.src,
        args.work_dir,
        badwords=badwords,
        bad_density=args.bad_density,
        seg_words=args.seg_words,
        resume=not args.no_resume,
    )
    # the scored output is itself a checkpointed boundary so a rerun of
    # a COMPLETED job is pure marker verification (zero recompute)
    fp = ckpt.chain_fingerprint(
        ckpt.src_fingerprint(args.src),
        "scored",
        {
            "badwords": list(badwords),
            "bad_density": args.bad_density,
            "seg_words": args.seg_words,
        },
    )
    out = ckpt.stage_boundary(
        lambda: scored, args.work_dir, "scored", fp, resume=not args.no_resume
    )
    print(
        json.dumps(
            {
                "work_dir": args.work_dir,
                "out": ckpt.stage_dir(args.work_dir, "scored"),
                "rows": out.count(),
            }
        )
    )
    import ray

    ray.shutdown()
    return 0


def cmd_shards(args) -> int:
    """Checkpoint-resumable corpus -> training-shards chain
    (pipelines/prep.py: corpus_to_shards): quality filter -> exact
    dedup -> chunking at one persisted boundary, then deterministic
    split + seeded shard write whose manifest fingerprint makes the
    write idempotent. Rerun with the same src+config = pure marker
    verification."""
    from rio_cogeo_ray.pipelines import prep

    _ray_init(args.threads)
    manifest = prep.corpus_to_shards(
        args.src,
        args.work_dir,
        num_shards=args.num_shards,
        window=args.window,
        stride=args.stride,
        resume=not args.no_resume,
    )
    print(
        json.dumps(
            {
                "work_dir": args.work_dir,
                "num_shards": manifest.get("num_shards"),
                "rows": manifest.get("rows"),
                "shard_rows": manifest.get("shard_rows"),
            }
        )
    )
    import ray

    ray.shutdown()
    return 0


def cmd_validate(args) -> int:
    """Thin verdict wrapper (cli.py:334-357 analog). A FILE path
    validates as a single-file export; a directory as a pyramid."""
    import os

    from rio_cogeo_ray.pipelines.validate import validate, validate_cog

    if os.path.isfile(args.src):
        ok, errors, warnings = validate_cog(args.src, strict=args.strict)
    else:
        ok, errors, warnings = validate(args.src, strict=args.strict)
    for w in warnings:
        print(f"WARNING: {w}", file=sys.stderr)
    for e in errors:
        print(f"ERROR: {e}", file=sys.stderr)
    if ok:
        print(f"{args.src} is a valid tile pyramid")
        return 0
    print(f"{args.src} is NOT a valid tile pyramid")
    return 1


def cmd_info(args) -> int:
    """Pretty or --json info dump (cli.py:360-480 analog)."""
    from rio_cogeo_ray.pipelines.info import info

    i = info(args.src)
    if args.json:
        print(i.to_json())
        return 0
    print(f"Path: {i.Path}\nEngine: {i.Engine}\nValid: {i.Valid}")
    g = i.GEO
    print(f"CRS: {g.CRS}\nBounds(WGS84): {g.BoundsWGS84}\nZoom: {g.MinZoom}..{g.MaxZoom}")
    print("IFDs (level, zoom, decimation, tiles, pages):")
    for d in i.IFDs:
        print(f"  {d.Level} z={d.Zoom} dec={d.Decimation} tiles={d.Tiles} pages={d.Pages}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rio_cogeo_ray", description=__doc__)
    # global flags (reference scripts/cli.py:200-230 parity): --quiet
    # silences warnings (Ray logs already run at ERROR, progress bars
    # already off); --config K=V is the generic config passthrough (the
    # GDAL -co/--config analog) — keys land in the environment, where
    # every engine knob reads them (RCR_IN_MEMORY_THRESHOLD,
    # RCR_SCALING_PAGES, RAY_*, ...).
    p.add_argument("-q", "--quiet", action="store_true",
                   help="suppress warnings and non-result chatter")
    p.add_argument("--config", action="append", default=[], metavar="K=V",
                   help="set an engine/env config key (repeatable)")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="build a tile pyramid from a pages/documents corpus")
    c.add_argument("src", help="input parquet file/dir")
    c.add_argument("dst", help="output pyramid dir")
    c.add_argument("--zoom", type=int, default=None,
                   help="max-zoom level; when given, --zoom-level-strategy "
                        "is ignored (reference --zoom-level semantics)")
    c.add_argument("--resolution", type=float, default=None,
                   help="target base resolution (mercator m/px); max zoom "
                        "is derived via --zoom-level-strategy")
    c.add_argument("--zoom-level-strategy", type=str.lower, default="auto",
                   choices=["auto", "lower", "upper"],
                   help="zoom rounding when derived from --resolution "
                        "(reference cli.py:149-158; case-insensitive)")
    c.add_argument("--invalid-policy", type=_parse_invalid_policy,
                   default="mask",
                   help="geocode-invalid page policy: mask|drop, or the "
                        "reference's nodata tokens — nan/<float> → mask, "
                        "nil/none/nada → drop (NodataParamType analog)")
    c.add_argument("--bidx", "-b", type=_parse_bidx, default=None,
                   help="channels to build, '1,2,...': 1=count, "
                        "2..=--weight-col entries (BdxParamType analog); "
                        "multiple indexes build one pyramid per channel "
                        "under DST/band_<i>")
    c.add_argument("--source", choices=["pages", "documents", "lonlat"], default="pages",
                   help="lonlat = pre-georeferenced input (GCP analog)")
    c.add_argument("--tms", default=None, metavar="PATH",
                   help="user tile-matrix-set JSON (reference --tms, "
                        "cli.py:214-218): {origin_x, origin_y, span_x, "
                        "span_y, cols0, rows0} quad grid over (lon, lat); "
                        "default WebMercatorQuad")
    c.add_argument("-p", "--cog-profile", dest="profile", default="deflate",
                   help="named creation profile (profiles.py analog)")
    c.add_argument("--blocksize", type=int, default=None, help="tile grid px (G)")
    c.add_argument("--overview-blocksize", type=int, default=None,
                   help="per-overview grid px (GDAL_TIFF_OVR_BLOCKSIZE "
                        "analog, reference cli.py:141-144); the engine's "
                        "block IS the tile, so this sets overview grid "
                        "resolution; sum/nearest/mode kernels only")
    c.add_argument("--overview-level", type=int, default=None)
    c.add_argument("--decimation-base", type=int, default=2)
    c.add_argument("--overview-resampling", default="sum",
                   choices=["sum", "average", "nearest", "mode", "rms",
                            "bilinear", "cubic", "cubic_spline", "lanczos",
                            "gauss"])
    c.add_argument("--aligned-levels", type=int, default=0)
    c.add_argument("--geocode-boxes", default=None,
                   help="'w,s,e,n[,weight];...' spatial distribution")
    c.add_argument("--geocode-invalid", type=int, default=0,
                   help="geocode-invalid pages per 65536 (nodata-fraction "
                        "analog; interacts with --invalid-policy)")
    c.add_argument("--extract", action="store_true", help="run html→text extraction")
    c.add_argument("--no-resume", action="store_true")
    c.add_argument("--weight-col", default=None,
                   help="integer/float column(s) accumulated into the "
                        "grids; comma list allowed with --bidx selection")
    c.add_argument("--tag", action="append", default=[], metavar="K=V",
                   help="dataset tag (repeatable; tag-forwarding analog)")
    c.add_argument("--band-tag", action="append", default=[], metavar="BAND:K=V",
                   help="band tag (repeatable; cogeo.py:395-437 analog)")
    c.add_argument("--colormap", default=None,
                   help="JSON {value: color} categorical colormap (cogeo.py:99)")
    c.add_argument("--threads", type=_parse_threads, default="all_cpus",
                   help="CPUs for ray.init ('all_cpus' or int)")
    c.set_defaults(fn=cmd_create)

    a = sub.add_parser("append", help="incrementally ingest a new corpus into an existing pyramid")
    a.add_argument("src", help="new input parquet file/dir")
    a.add_argument("dst", help="existing pyramid dir")
    a.add_argument("--threads", type=_parse_threads, default="all_cpus")
    a.set_defaults(fn=cmd_append)

    e = sub.add_parser("export", help="export a pyramid dir as ONE file (use_cog_driver analog)")
    e.add_argument("src", help="existing pyramid dir")
    e.add_argument("dst", help="output single-file path")
    e.add_argument("--row-group-tiles", type=int, default=4096)
    e.add_argument("--threads", type=_parse_threads, default="all_cpus")
    e.set_defaults(fn=cmd_export)

    pr = sub.add_parser(
        "prep",
        help="checkpoint-resumable web-prep chain (FILTER -> DEDUP -> SCORE)",
    )
    pr.add_argument("src", help="documents parquet file/dir (doc_id, text)")
    pr.add_argument("work_dir", help="checkpoint + output directory")
    pr.add_argument("--badwords", default="spark,dup,slow",
                    help="comma blocklist (prep.DEFAULT_BADWORDS)")
    pr.add_argument("--bad-density", type=int, default=5)
    pr.add_argument("--seg-words", type=int, default=10)
    pr.add_argument("--no-resume", action="store_true",
                    help="ignore existing stage markers and rebuild")
    pr.add_argument("--threads", type=_parse_threads, default="all_cpus")
    pr.set_defaults(fn=cmd_prep)

    sh = sub.add_parser(
        "shards",
        help="checkpoint-resumable corpus -> training shards (split + seeded shuffle)",
    )
    sh.add_argument("src", help="documents parquet file/dir (doc_id, text)")
    sh.add_argument("work_dir", help="checkpoint + shard output directory")
    sh.add_argument("--num-shards", type=int, default=4)
    sh.add_argument("--window", type=int, default=120, help="chunk window chars")
    sh.add_argument("--stride", type=int, default=80, help="chunk stride chars")
    sh.add_argument("--no-resume", action="store_true",
                    help="ignore existing stage markers and rebuild")
    sh.add_argument("--threads", type=_parse_threads, default="all_cpus")
    sh.set_defaults(fn=cmd_shards)

    v = sub.add_parser("validate", help="validate a pyramid output")
    v.add_argument("src")
    v.add_argument("--strict", action="store_true")
    v.set_defaults(fn=cmd_validate)

    i = sub.add_parser("info", help="pyramid metadata")
    i.add_argument("src")
    i.add_argument("--json", action="store_true")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    for kv in args.config:
        if "=" not in kv:
            print(f"ERROR: --config expects K=V, got {kv!r}", file=sys.stderr)
            return 2
        k, v = kv.split("=", 1)
        os.environ[k] = v
    if args.quiet:
        import warnings as _warnings

        _warnings.simplefilter("ignore")
        os.environ["RCR_QUIET"] = "1"
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
