"""Single-buffer device placement for many-leaf pytrees.

On remote-relay TPUs every device_put LEAF pays a fixed per-array cost
(~40 ms measured) on top of bandwidth, so placing a 30-leaf stacked
repertoire bucket costs ~1.2 s of pure overhead for ~8 MB of data.
``device_put_packed`` concatenates the leaves into ONE flat host buffer
per dtype, ships those few buffers with a single device_put, and slices
them back into the original arrays on device with one jitted
static-slicing program (pure reshape/slice — compiles in well under a
second and hits the persistent cache thereafter).

Exactness: leaves are raveled and concatenated byte-for-byte per dtype;
the unpack is static slicing + reshape, so every array round-trips
bit-identically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("spec",))
def _unpack(buffers, spec):
    """Slice each dtype buffer back into its leaves (static offsets)."""
    out = {}
    for key, items in spec:
        buf = buffers[key]
        off = 0
        for idx, shape in items:
            n = 1
            for s in shape:
                n *= s
            out[idx] = buf[off:off + n].reshape(shape)
            off += n
    return tuple(out[i] for i in range(len(out)))


def device_put_packed(tree):
    """jax.device_put(tree), but with one wire buffer per leaf dtype.

    Returns the same pytree structure with device arrays.  Scalars and
    zero-size leaves are handled; dtypes are preserved exactly.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    groups = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        groups.setdefault(a.dtype.str, []).append((i, a))
    buffers = {}
    spec = []
    for key in sorted(groups):
        items = groups[key]
        buffers[key] = np.concatenate(
            [a.ravel() for _, a in items]) if items else np.empty(0)
        spec.append((key, tuple((i, a.shape) for i, a in items)))
    dev = jax.device_put(buffers)
    out_leaves = _unpack(dev, spec=tuple(spec))
    return jax.tree.unflatten(treedef, list(out_leaves))
