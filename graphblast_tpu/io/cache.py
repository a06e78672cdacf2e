"""Binary graph cache: canonicalized-COO npz sidecar files.

TPU equivalent of the reference's hidden .bin cache
(reference: util.hpp:340-357 convert() filename derivation +
sparse_matrix.hpp:328-407 serialize/deserialize of nrows,nvals,rowptr,colind):
the first load of an .mtx parses + canonicalizes and writes
`.{name}.{ud|d}.{nosl|sl}.npz`; subsequent loads mmap the arrays and skip the
parse entirely.
"""
from __future__ import annotations

import os

import numpy as np

from . import mmio


def cache_path(mtx_path: str, undirected: bool, removed_loops: bool) -> str:
    """Hidden sidecar name (reference: util.hpp:340-357 convert())."""
    d, b = os.path.split(mtx_path)
    stem = os.path.splitext(b)[0]
    tag = "ud" if undirected else "d"
    sl = "nosl" if removed_loops else "sl"
    return os.path.join(d, f".{stem}.{tag}.{sl}.npz")


def read_mtx_cached(path: str, directed: int = 0,
                    remove_self_loops: bool | None = None):
    """read_mtx with npz caching. Returns (rows, cols, vals, nrows, ncols)."""
    if remove_self_loops is None:
        remove_self_loops = mmio._REMOVE_SELFLOOP
    # determine undirectedness cheaply from the banner
    with open(path, "r") as f:
        info = mmio.read_banner(f.readline())
    undirected = info.is_symmetric or directed == 2
    if directed == 1:
        undirected = False

    cpath = cache_path(path, undirected, remove_self_loops)
    if os.path.exists(cpath) and os.path.getmtime(cpath) >= os.path.getmtime(path):
        z = np.load(cpath, mmap_mode="r")
        return (np.asarray(z["rows"]), np.asarray(z["cols"]),
                np.asarray(z["vals"]), int(z["nrows"]), int(z["ncols"]))

    rows, cols, vals, nrows, ncols, _ = mmio.read_mtx(
        path, directed=directed, remove_self_loops=remove_self_loops)
    try:
        np.savez(cpath, rows=rows, cols=cols, vals=vals,
                 nrows=nrows, ncols=ncols)
    except OSError:
        pass  # read-only dir: skip caching, like the reference's silent skip
    return rows, cols, vals, nrows, ncols
