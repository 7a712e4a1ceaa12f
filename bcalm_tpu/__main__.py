"""`python -m bcalm_tpu` entry (the analog of the reference `bcalm` binary,
/root/reference/src/main.cpp:26-51: version fast path + exception-to-exit-code
wrapping)."""

import sys


def run() -> int:
    try:
        from bcalm_tpu.cli import main

        return main()
    except KeyboardInterrupt:
        return 130
    except Exception as e:  # noqa: BLE001 — mirror reference's catch-all
        print(f"EXCEPTION: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(run())
