"""Differentiable survivor compaction/expansion (linear permutation ops).

Wraps the Pallas stream kernels (ops/pallas/compact_kernel.py) as a pair
of `jax.custom_vjp` linear maps so the backward bounce replay
(ops/mega.py::_mega_bwd) can run its post-split bounces at compacted
width, exactly like the forward megakernel split:

  apply_compact : original order -> packed alive prefix
  apply_expand  : packed alive prefix -> original order (dead lanes get
                  static fills)

Each is the transpose of the other (compaction discards dead lanes whose
expansion fills carry no gradient), so

  vjp(apply_compact) = apply_expand of the cotangents
  vjp(apply_expand)  = apply_compact of the cotangents

A `plan` (the compacted local-position plane + per-chunk row offsets,
both derived solely from the dead mask) is computed once per replay by
:func:`plan_compaction` and threaded through both ops as
non-differentiated residues.

The reference has no analog (CUDA keeps dead threads resident,
`cuSrc/path_tracer.cu:141-170`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cpppathtracer_tpu.ops.pallas.compact_kernel import (
    stream_compact,
    stream_expand,
    unstack_planes,
)


def _float0_like(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def plan_compaction(missed, *, chunk, interpret=False):
    """Derive the compaction plan from the dead mask alone.

    Returns (pos_c i32[R] — compacted-domain local positions, offs_rows
    i32[n_chunks], n_alive i32[] — row-rounded packed prefix length).
    """
    comp, offs, nal = stream_compact(
        missed, (), fills=(), chunk=chunk, interpret=interpret
    )
    (pos_c,) = unstack_planes(comp, (jnp.int32,))
    return pos_c, offs, nal[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def compact_mixed(missed, planes, n_diff, fills, chunk, interpret):
    """One-kernel compaction of `planes` where only the first `n_diff`
    planes are differentiated (the rest are index/key payloads).  Returns
    (packed planes, pos_c, offs_rows, n_alive) — pos_c/offs/n_alive are
    the plan for the matching apply_expand, derived from the same kernel
    invocation."""
    comp, offs, nal = stream_compact(
        missed, planes, fills=fills, chunk=chunk, interpret=interpret
    )
    up = unstack_planes(
        comp, tuple(p.dtype for p in planes) + (jnp.int32,)
    )
    return up[:-1], up[-1], offs, nal[0]


def _compact_mixed_fwd(missed, planes, n_diff, fills, chunk, interpret):
    out = compact_mixed(missed, planes, n_diff, fills, chunk, interpret)
    _planes_c, pos_c, offs, _nal = out
    return out, (missed, pos_c, offs)


def _compact_mixed_bwd(n_diff, fills, chunk, interpret, res, cts):
    missed, pos_c, offs = res
    ct_planes_c = cts[0][:n_diff]
    dtypes = tuple(ct.dtype for ct in ct_planes_c)
    stack = _stack_for_expand(ct_planes_c, pos_c)
    ct_planes = stream_expand(
        missed, stack, offs, dtypes=dtypes, fills=(0,) * n_diff,
        chunk=chunk, interpret=interpret,
    )
    ct_tree = tuple(ct_planes) + tuple(
        _float0_like(c) for c in cts[0][n_diff:]
    )
    return (jnp.zeros_like(missed), ct_tree)


compact_mixed.defvjp(_compact_mixed_fwd, _compact_mixed_bwd)


def _stack_for_expand(planes_c, pos_c):
    bci = lambda p: (
        p if p.dtype == jnp.int32
        else jax.lax.bitcast_convert_type(p, jnp.int32)
    )
    n = len(planes_c)
    r = pos_c.shape[0]
    np_pad = -(-(n + 1) // 8) * 8
    rows = [bci(p)[None] for p in planes_c] + [pos_c[None]]
    if np_pad != n + 1:
        rows.append(jnp.zeros((np_pad - n - 1, r), jnp.int32))
    return jnp.concatenate(rows, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def apply_compact(missed, pos_c, offs, planes, fills, chunk, interpret):
    """Pack the alive lanes of `planes` (tuple of f32/i32 [R]) to the
    global prefix.  Linear in `planes`; missed/pos_c/offs carry no
    gradient."""
    comp, _offs2, _nal = stream_compact(
        missed, planes, fills=fills, chunk=chunk, interpret=interpret
    )
    return unstack_planes(comp, tuple(p.dtype for p in planes))


def _apply_compact_fwd(missed, pos_c, offs, planes, fills, chunk, interpret):
    out = apply_compact(missed, pos_c, offs, planes, fills, chunk, interpret)
    return out, (missed, pos_c, offs)


def _apply_compact_bwd(fills, chunk, interpret, res, cts):
    missed, pos_c, offs = res
    dtypes = tuple(ct.dtype for ct in cts)
    ct_fills = (0,) * len(cts)  # dropped (dead) lanes contributed nothing
    stack = _stack_for_expand(cts, pos_c)
    ct_planes = stream_expand(
        missed, stack, offs, dtypes=dtypes, fills=ct_fills, chunk=chunk,
        interpret=interpret,
    )
    return (
        jnp.zeros_like(missed),
        _float0_like(pos_c),
        _float0_like(offs),
        tuple(ct_planes),
    )


apply_compact.defvjp(_apply_compact_fwd, _apply_compact_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def apply_expand(missed, pos_c, offs, planes_c, dtypes, fills, chunk,
                 interpret):
    """Route packed lane k back to the k-th alive original position; dead
    lanes get `fills`.  Linear in `planes_c`."""
    stack = _stack_for_expand(planes_c, pos_c)
    return tuple(stream_expand(
        missed, stack, offs, dtypes=dtypes, fills=fills, chunk=chunk,
        interpret=interpret,
    ))


def _apply_expand_fwd(missed, pos_c, offs, planes_c, dtypes, fills, chunk,
                      interpret):
    out = apply_expand(
        missed, pos_c, offs, planes_c, dtypes, fills, chunk, interpret
    )
    return out, (missed, pos_c, offs)


def _apply_expand_bwd(dtypes, fills, chunk, interpret, res, cts):
    missed, pos_c, offs = res
    ct_fills = tuple(0 for _ in cts)
    comp, _o, _n = stream_compact(
        missed, cts, fills=ct_fills, chunk=chunk, interpret=interpret
    )
    return (
        jnp.zeros_like(missed),
        _float0_like(pos_c),
        _float0_like(offs),
        unstack_planes(comp, tuple(ct.dtype for ct in cts)),
    )


apply_expand.defvjp(_apply_expand_fwd, _apply_expand_bwd)
