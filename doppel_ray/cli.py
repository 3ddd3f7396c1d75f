"""CLI: the ``doppel find`` / ``doppel preset`` surface over the Ray Data
engine (reference cmd/find.go:113-184, cmd/preset.go:15-131).

    python -m doppel_ray find CORPUS_DIR [--near] [--min-size 1KB] ...
    python -m doppel_ray preset {dev,media,docs,clean} CORPUS_DIR
    python -m doppel_ray job CORPUS_DIR --checkpoint-dir CK [--near]

Precedence matches the reference: config files < env (DOPPEL_*) < CLI
flags (README.md:162-186; only flags the user actually set override —
the ``IsSet`` semantics of cmd/find.go:113-147, implemented here by
argparse defaults of None). The reference's mis-wired regex flags
(cmd/find.go:70-80 checks names the flags never carry) are implemented
as INTENDED, not as shipped.

CLI-shell parity with the reference ``main.go``:
* bare invocation routes to ``find`` (DefaultCommand, main.go:99):
  ``python -m doppel_ray CORPUS_DIR`` == ``... find CORPUS_DIR``
* ``--version`` prints the engine version (main.go:25,65)
* SIGINT/SIGTERM trigger a graceful shutdown — log, ``ray.shutdown()``,
  exit 130 (main.go:47-54); a checkpointed ``job`` interrupted mid-stage
  resumes from its manifest on the next run.
"""

from __future__ import annotations

import argparse
import signal
import sys

from doppel_ray import __version__
from doppel_ray import config as C
from doppel_ray import logger as L
from doppel_ray.pipelines import report as R

_COMMANDS = {"find", "preset", "job"}


def _overlay(cfg: C.JobConfig, args: argparse.Namespace) -> C.JobConfig:
    mapping = {
        "workers": "workers",
        "output_format": "output_format",
        "output": "output",
        "exclude_dirs": "exclude_dirs",
        "exclude_files": "exclude_files",
        "exclude_dir_regex": "exclude_dir_regex",
        "exclude_file_regex": "exclude_file_regex",
        "min_size": "min_size",
        "max_size": "max_size",
    }
    for arg_name, field in mapping.items():
        v = getattr(args, arg_name, None)
        if v is not None:  # only user-set flags override (IsSet semantics)
            setattr(cfg.find, field, v)
    if getattr(args, "preset", None):
        cfg.find.preset = args.preset
    if getattr(args, "threshold", None) is not None:
        cfg.dedup.threshold = args.threshold
    return cfg


def _add_find_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("paths", nargs="+", help="parquet corpus dirs/files")
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--output-format", dest="output_format",
                   choices=["json", "yaml", "pretty"], default=None)
    p.add_argument("--output", default=None, help="stdout|stderr|path")
    p.add_argument("--exclude-dirs", dest="exclude_dirs", default=None)
    p.add_argument("--exclude-files", dest="exclude_files", default=None)
    p.add_argument("--exclude-dirs-regex", dest="exclude_dir_regex", default=None)
    p.add_argument("--exclude-files-regex", dest="exclude_file_regex", default=None)
    p.add_argument("--min-size", dest="min_size", default=None)
    p.add_argument("--max-size", dest="max_size", default=None)
    p.add_argument("--near", action="store_true",
                   help="also run MinHash/LSH near-dedup + clustering")
    p.add_argument("--threshold", type=float, default=None,
                   help="near-dup Jaccard tau (default 0.8)")
    p.add_argument("--out-dir", default=None,
                   help="write groups/clusters parquet here")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="doppel_ray")
    ap.add_argument(
        "--version", action="version", version=f"%(prog)s {__version__}"
    )
    ap.add_argument("--config", default=None, help="job config file (toml/yaml/json)")
    sub = ap.add_subparsers(dest="command")

    find_p = sub.add_parser("find", help="find duplicate documents")
    _add_find_flags(find_p)

    preset_p = sub.add_parser("preset", help="find with a named filter preset")
    preset_p.add_argument("preset", choices=["dev", "media", "docs", "clean"])
    _add_find_flags(preset_p)

    job_p = sub.add_parser("job", help="checkpointed resumable dedup job")
    job_p.add_argument("paths", nargs="+")
    job_p.add_argument("--checkpoint-dir", required=True)
    job_p.add_argument("--near", action="store_true")
    job_p.add_argument("--simhash", action="store_true")
    job_p.add_argument("--containment", action="store_true")
    job_p.add_argument(
        "--checkpoint-signatures",
        dest="checkpoint_signatures",
        action="store_true",
        help="checkpoint the MinHash signature rows as their own stage "
        "(resume past signing; disables the exact-dup pre-prune)",
    )
    return ap


# Top-level flags that consume the following token as their value.  The
# router must know these so ``--config cfg.toml find corpus/`` does not
# mistake ``cfg.toml`` for the first positional (the reference's
# urfave/cli DefaultCommand is flag-grammar-aware, main.go:99).
_VALUE_FLAGS = {"--config"}


def _route_default_command(argv: list[str]) -> list[str]:
    """Bare invocation routes to ``find`` (reference DefaultCommand,
    main.go:99): the first positional token not naming a subcommand
    gets ``find`` prepended; pure-flag invocations pass through.
    Value-taking top-level flags (``--config FILE`` / ``--config=FILE``)
    are skipped together with their argument."""
    i = 0
    # consume leading top-level flags — they must stay before the
    # inserted subcommand for argparse to accept them
    while i < len(argv):
        tok = argv[i]
        if tok in ("-h", "--help", "--version"):
            return argv
        if tok in _VALUE_FLAGS:
            i += 2  # skip the flag and its value
        elif any(tok.startswith(f + "=") for f in _VALUE_FLAGS):
            i += 1
        else:
            break
    for j in range(i, len(argv)):
        tok = argv[j]
        if tok in ("-h", "--help", "--version"):
            return argv
        if tok.startswith("-"):
            continue  # subcommand flag (e.g. --near) — belongs after find
        if tok in _COMMANDS:
            return argv
        return [*argv[:i], "find", *argv[i:]]
    return argv


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args = build_parser().parse_args(_route_default_command(list(argv)))
    if args.command is None:
        build_parser().print_help()
        return 2

    if args.config:
        # --config path: fresh loader with that file + env (main.go:102-119)
        providers = [C.FileProvider(args.config, priority=10), C.EnvProvider(priority=100)]
    else:
        providers = None
    cfg = C.load_config(providers)
    cfg = _overlay(cfg, args)
    C.validate(cfg)
    log = L.configure_from(cfg.log)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # graceful SIGINT/SIGTERM: log, shut the Ray session down, exit 130
    # (reference main.go:47-54; an interrupted checkpointed job resumes
    # from its manifest on the next invocation)
    def _on_signal(signum, frame):
        log.info("received signal, shutting down", signal=signum)
        try:
            ray.shutdown()
        finally:
            sys.exit(130)

    for s in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(s, _on_signal)
        except ValueError:
            pass  # not the main thread (e.g. under a test runner)
    try:
        if args.command == "job":
            from doppel_ray.pipelines import job as J

            res = J.run_dedup_job(
                args.paths if len(args.paths) > 1 else args.paths[0],
                args.checkpoint_dir,
                cfg,
                near=args.near,
                with_simhash=args.simhash,
                with_containment=args.containment,
                checkpoint_signatures=args.checkpoint_signatures,
            )
            print(
                f"stages computed={res.computed_stages} "
                f"resumed={res.resumed_stages} groups={res.groups.count()}"
            )
            return 0

        from doppel_ray.pipelines.dedup import find_duplicates

        rep, _groups = find_duplicates(
            args.paths if len(args.paths) > 1 else args.paths[0],
            cfg,
            near=args.near,
            out_dir=args.out_dir,
        )
        R.write_report(
            rep, fmt=cfg.find.output_format, dest=cfg.find.output
        )
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
