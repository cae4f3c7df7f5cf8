"""common/ — shared CLI plumbing (ref: /root/reference/common/).

The reference concentrates its ~200-flag declarative argument table in
common/arg.cpp; this package is the TPU framework's analogue: one table
(`args.py`) shared by every entry point, each row carrying its tools
scope and environment-variable mirror.
"""

from .args import (  # noqa: F401
    OPTIONS,
    Opt,
    build_parser,
    grammar_from_args,
    sampler_from_args,
)
