"""Reference-parity argparse subclass.

cxxopts parse errors in the reference CLIs print the message, a blank
line, and the full help text to stderr, then exit 2
(annonet_train_main.cpp:330-335, annonet_infer_main.cpp:335-340).
argparse's default is a brief usage line; this subclass reproduces the
reference behavior for every parse failure (unknown flag, bad value,
and the explicit "Option 'input-directory' is required but not present"
check the callers route through :func:`ArgumentParser.error`).
"""

from __future__ import annotations

import argparse
import sys


class ReferenceParser(argparse.ArgumentParser):
    def error(self, message: str):  # noqa: D102 — argparse override
        print(message, file=sys.stderr)
        print(file=sys.stderr)
        self.print_help(sys.stderr)
        raise SystemExit(2)
