"""Small pytree utilities."""

from __future__ import annotations

import jax


def tree_size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))
