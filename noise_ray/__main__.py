"""CLI entry: ``python -m noise_ray [script.noiseq]``.

With a file argument, executes its `;`-terminated statements; otherwise
reads statements from stdin (interactive prompt on a TTY)."""

import sys


def main():
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
