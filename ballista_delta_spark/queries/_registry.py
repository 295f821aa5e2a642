"""Tiny registration helper shared by the query modules."""

from __future__ import annotations


def make_registry(queries: dict):
    """Returns a decorator: @q("id", "oracle sql or None") registers the fn."""

    def q(name: str, sql: str | None):
        def deco(fn):
            queries[name] = (fn, sql)
            return fn

        return deco

    return q
