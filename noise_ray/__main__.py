"""CLI entry: ``python -m noise_ray [script.noiseq | subcommand …]``.

With a file argument, executes its `;`-terminated statements; with a
job subcommand (build / merge / bm25 / query / …) or ``--help``,
delegates to the argparse job CLI (noise_ray/cli.py); otherwise reads
statements from stdin (interactive prompt on a TTY)."""

import sys

_JOB_CMDS = {"build", "build-json", "merge", "merge-json", "split",
             "split-json", "compact", "snapshot", "restore", "bm25",
             "query", "stats"}


def main():
    if len(sys.argv) > 1 and (sys.argv[1] in _JOB_CMDS
                              or sys.argv[1].startswith("-")):
        from .cli import main as cli_main

        raise SystemExit(cli_main(sys.argv[1:]))
    from .repl import run

    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            run(f, interactive=False)
    else:
        run()
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
