"""Shared utilities: profiling/tracing, misc helpers."""


class DotDict(dict):
    """dict with attribute access (reference util.py:49-56 — defined there
    and unused; kept for API familiarity)."""

    __getattr__ = dict.get
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__
