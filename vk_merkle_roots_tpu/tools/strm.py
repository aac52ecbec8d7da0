"""``strm`` — write command-line arguments as a newline-separated stream
(fixture helper, equivalent of ``/root/reference/src/strm/Strm.cpp:18-35``)."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    args = sys.argv[1:] if argv is None else argv
    out = sys.stdout.buffer
    for arg in args:
        out.write(arg.encode() if isinstance(arg, str) else arg)
        out.write(b"\n")
    out.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
