"""``mna`` driver — the reference's second binary (mna_cmd.cpp: direct-LU
full-MNA transient + optional IR report). Thin profile over the pg driver
with the ETBR/iterative paths disabled."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from gmres_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    from gmres_tpu.cli.pg import main as pg_main

    argv = list(sys.argv[1:] if argv is None else argv)
    banned = {"-fast", "-gmres", "-ec"}
    argv = [a for a in argv if a not in banned]
    return pg_main(argv)


if __name__ == "__main__":
    sys.exit(main())
