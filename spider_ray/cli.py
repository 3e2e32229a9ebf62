"""CLI — the reference's command surface (cli.py:19-138) over the Ray engine.

    python -m spider_ray.cli crawl URL --corpus DIR --out DIR [--depth N]
        [--concur N] [--no-cache] [--no-overwrite] [--silent] [--use-proxy]
        [--robots PATH]
    python -m spider_ray.cli catch URL --out DIR [-n N]
    python -m spider_ray.cli cobweb {create|drop|count} --out DIR

Mapping to the reference: ``crawl`` = AppController.save → Crawler.crawl
(app_controller.py:56-82); ``catch`` = get-by-parent + limit (cli.py:54-60);
``cobweb`` = DDL/maintenance dispatch (cli.py:100-106). ``--concur`` is the
per-host politeness budget — the INTENDED semantics of the reference's
broken semaphore (quirk q5, crawler.py:82). ``--db-type`` picks the export
sink from the registry (unknown → default, reference manager.py:25-31);
DB credentials keys are accepted and persisted to config.ini for interface
parity but carry no meaning for a parquet store.

Owns its Ray session (guarded init + shutdown) — library code never does.
"""

from __future__ import annotations

import argparse
import sys


def build_parser(config) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spider-ray", description="Ray-Data-native crawler.")
    p.add_argument("--db-type", default=config.get_db_config("type"))
    p.add_argument("--db-user", default=config.get_db_config("username"))
    p.add_argument("--db-pwd", default=config.get_db_config("password"))
    p.add_argument("--db-host", default=config.get_db_config("host"))
    p.add_argument("--db-name", default=config.get_db_config("name"))
    p.add_argument("--db-update", action="store_true", default=False)
    sub = p.add_subparsers(dest="command")

    c = sub.add_parser("crawl", help="Crawl a URL into the store.")
    c.add_argument("url")
    c.add_argument("--corpus", required=True, help="pages parquet dir (the 'network')")
    c.add_argument("--out", required=True, help="store/checkpoint output dir")
    c.add_argument("--depth", type=int, default=1)
    c.add_argument(
        "--concur",
        type=int,
        default=None,
        help="per-host politeness budget per round (default from config)",
    )
    c.add_argument("--no-cache", dest="cache", action="store_false")
    c.add_argument("--no-overwrite", dest="overwrite", action="store_false")
    c.add_argument("--silent", action="store_true", default=False)
    c.add_argument("--no-logtime", dest="log_time", action="store_false")
    c.add_argument("--use-proxy", action="store_true", default=False)
    c.add_argument("--robots", default=None, help="robots rules parquet table")
    c.add_argument("--resume", action="store_true", default=False)

    g = sub.add_parser("catch", help="Get URLs from the store by parent.")
    g.add_argument("url")
    g.add_argument("--out", required=True)
    g.add_argument("-n", type=int, default=10)

    d = sub.add_parser("cobweb", help="Store maintenance.")
    d.add_argument("action", choices=["create", "drop", "count"])
    d.add_argument("--out", required=True)
    return p


def main(argv: list[str] | None = None, config_dir: str | None = None) -> int:
    from spider_ray.config import ConfigController

    config = ConfigController(base_dir=config_dir)
    args = build_parser(config).parse_args(argv)
    if args.command is None:
        print("usage: spider-ray {crawl,catch,cobweb} ...", file=sys.stderr)
        return 2
    if args.db_update:
        config.update(
            {
                "type": args.db_type,
                "username": args.db_user,
                "password": args.db_pwd,
                "host": args.db_host,
                "name": args.db_name,
            }
        )

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        return _dispatch(args, config)
    finally:
        if owns_session:
            ray.shutdown()


def _dispatch(args, config) -> int:
    import time

    from spider_ray.pipelines import store_ops
    from spider_ray.pipelines.crawl import crawl

    if args.command == "crawl":
        proxy = None
        if args.use_proxy:
            from spider_ray.config import validate_proxy

            proxy = validate_proxy(config.get_infrastructure_config("proxy_host"))
        budget = args.concur
        if budget is None:
            raw = config.get_infrastructure_config("concurrency_limit")
            budget = int(raw) if raw else None
        t0 = time.perf_counter()
        kw = dict(
            max_depth=args.depth,
            per_host_budget=budget,
            use_cache=args.cache,
            robots=args.robots,
            proxy=proxy,
        )

        import glob
        import os
        import shutil

        from spider_ray.pipelines.crawl import read_store

        has_store = not args.resume and read_store(args.out).count() > 0 if (
            os.path.exists(os.path.join(args.out, "store"))
        ) else False
        if has_store:
            # RE-crawl over an existing store: crawl into a scratch dir and
            # reconcile with the reference's upsert semantics — overwrite
            # keeps the new rows, --no-overwrite keeps the old ones
            # (postgres_database.py:162-182); rows only one side has are
            # always kept. The old checkpoints belong to the old run.
            scratch = args.out + ".recrawl"
            merged = args.out + ".merged"
            shutil.rmtree(scratch, ignore_errors=True)
            shutil.rmtree(merged, ignore_errors=True)
            res = crawl(args.corpus, [args.url], scratch, **kw)
            from spider_ray.pipelines import store_ops as so

            so.reconcile_stores(args.out, scratch, merged, overwrite=args.overwrite)
            shutil.rmtree(os.path.join(args.out, "store"))
            dest = os.path.join(args.out, "store", "r0000")
            os.makedirs(dest)
            for f in glob.glob(os.path.join(merged, "*.parquet")):
                shutil.move(f, dest)
            shutil.rmtree(os.path.join(args.out, "rounds"), ignore_errors=True)
            shutil.rmtree(scratch, ignore_errors=True)
            shutil.rmtree(merged, ignore_errors=True)
        else:
            try:
                res = crawl(args.corpus, [args.url], args.out, resume=args.resume, **kw)
            except RuntimeError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1

        if args.db_type and args.db_type != "parquet":
            from spider_ray.sinks import get_sink

            sink = get_sink(args.db_type)
            export_dir = os.path.join(args.out, f"export-{sink.verbose}")
            shutil.rmtree(export_dir, ignore_errors=True)
            sink.write(read_store(args.out), export_dir)
            if not args.silent:
                print(f"Exported store via {sink.verbose} sink to {export_dir}")

        if not args.silent:
            msg = f"Done. (crawled: {res.crawled}, total calls: {res.total_calls})"
            if args.log_time:
                msg += f" [{time.perf_counter() - t0:.2f}s]"
            print(msg)
        return 0

    if args.command == "catch":
        rows = store_ops.catch(args.out, args.url, args.n).to_pandas()
        for i, row in enumerate(rows.itertuples(), 1):
            print(f"#{i} {row.url} | {row.title}")  # db_ops_controller.py:62-63 format
        return 0

    if args.command == "cobweb":
        if args.action == "count":
            print(store_ops.count_all(args.out))
        elif args.action == "drop":
            store_ops.drop_store(args.out)
            print("Dropped.")
        else:  # create — output layout init (reference create_table)
            import os

            os.makedirs(os.path.join(args.out, "store"), exist_ok=True)
            os.makedirs(os.path.join(args.out, "rounds"), exist_ok=True)
            print("Created.")
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
