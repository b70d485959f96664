"""Pallas TPU kernel for batched Felsenstein pruning over xMSA columns.

Drop-in accelerated implementation of ``ops.pruning.site_log_likelihoods``
batched over trees (reference boundary: libpll TraversalUpdate +
per-site LogLikelihood, src/PhyloHMM.cpp:220-238).

Why a kernel: the XLA version carries the full partials tensor through a
``lax.scan`` whose every step gathers a child slice and scatter-updates a
parent slice; batched gather/scatter round-trips HBM and dominates the
pipeline (measured 27ms of a 27ms step at T=1024, X=863 on v5e).  Here
each tree's live partials sit in a small VMEM scratch, the schedule
arrives as scalar-prefetched SMEM tables (the only memory space with free
dynamic indexing), and the only HBM traffic is the tip codes in and the
per-site log-likelihoods out.

The input is a *slot-reuse schedule* (io/schedule.py): one flat entry
list per tree in a post order where each node's heaviest subtree is
evaluated first.  A first-write flag stores a message into its parent
slot (fresh slot, or the in-place transform of a node's first internal
child); later messages multiply in, and a consumed child's slot is
recycled.  Peak live slots is ~log2(n_tips), so the partials scratch
[n_slots, R, 4, Xb] stays tiny at ANY family depth and the site-block
width Xb covers a 312-sequence family's whole ~1k-column xMSA in ONE
serial pass over the topology — the round-4 one-slot-per-internal-node
layout needed 313 slots, which forced Xb=256 under the ~16MB scoped-VMEM
cap, i.e. 4 topology passes plus a 313-iteration per-slot renorm loop
(the measured throughput ceiling at the reference's CI depth,
PERF_r04_312seq.json).  The first-write flags also delete the whole-
scratch ones-initialization.

Tip observations stay in the deduplicated [n_rows, X] xMSA form, shared
across the whole tree batch; tip entries resolve their row inside the
kernel through the scalar-prefetched schedule, so the [T, n_tips, X]
gathered tensor (~150MB of HBM traffic per step at production batch
sizes) never exists.

Per-edge transition matrices ARE formed — but as tiny [R, 4, 4] tensors,
not per-site ones:

    P = max(U @ diag(exp(lam * t * rate)) @ U^-1, 0)

costs a handful of sub-register ops per entry, and then the per-site
propagation is a single 4-term broadcast-FMA chain

    msg[r, i, x] = sum_j P[r, i, j] * p[r, j, x]

(16 R*Xb FLOPs/entry vs 36 for the factored two-contraction form; pure
VPU work — a 4x4 contraction would waste a padded 128x128 MXU pass).
Clamping P itself at 0 also kills eigenbasis-roundoff negatives at the
source.

Batch-padding entries re-store a one-hot into the sink slot with branch
length 0: exact no-ops whose renormalization factor is exactly 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-kernel VMEM budget for the partials scratch + shared codes block;
# Xb shrinks to fit.  Wide blocks amortize the serial post-order loop over
# more lanes (one pass over the topology instead of one per site block).
# v5e VMEM is 128MB, but XLA enforces a ~16MB SCOPED vmem stack limit per
# kernel (measured on hardware: a 17.17MB allocation at 312-seq depth was
# rejected with "limit 16.00M"); budget 15MB so the largest production
# shapes compile while leaving slack for the in/out blocks.  With slot
# reuse the partials scratch is ~1MB even at extreme depth; the shared
# xMSA codes block is now the dominant per-column term.
_SCRATCH_BYTES = 15 * 1024 * 1024
# Budget for the scalar-prefetched SMEM tables; the tree chunk shrinks
# to fit (hardware SMEM is ~1MB).
_SMEM_BYTES = 512 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    # scalar prefetch (SMEM); packed into two arrays because SMEM pads
    # each array's minor dimension to 128 lanes.
    topo_ref,         # [2N + 1, Tc] int32: rows = [src (N) | penc (N) |
                      # root]; penc = parent_slot*4 + first*2 + is_tip
    lengths_ref,      # [N, Tc] f32 branch lengths
    # VMEM blocks
    codes_ref,        # [n_rows, 1, Xb] int32 (xMSA rows, SHARED across
                      # trees; tip entries resolve rows through the
                      # scalar-prefetched schedule)
    u_ref,            # [TB, 4, 4] f32
    uinv_ref,         # [TB, 4, 4] f32
    lam_ref,          # [TB, 4] f32
    rates_ref,        # [TB, R] f32
    pi_ref,           # [TB, 4] f32
    out_ref,          # [TB, Xb] f32
    # scratch
    partials,         # VMEM [n_slots, R, 4, Xb] f32 (live partials only)
    scale,            # VMEM [R, Xb] f32
    *,
    trees_per_block: int,
    n_entries: int,
    n_rates: int,
    unroll: bool,
    renorm_stride: int,
):
    prog = pl.program_id(0)
    R = n_rates

    def loop(n, body):
        """Static unroll (small trees: better scheduling) or fori (big
        trees: bounded code size)."""
        if unroll:
            for i in range(n):
                body(i, 0)
        else:
            jax.lax.fori_loop(0, n, body, 0)

    def renorm(upd):
        """Per-(rate, site) max-normalization; returns (normed, log max)."""
        m = jnp.max(upd, axis=1, keepdims=True)            # [R, 1, Xb]
        m = jnp.where(m > 0, m, 1.0)
        return upd / m, jnp.log(m[:, 0, :])

    for tb in range(trees_per_block):
        t = prog * trees_per_block + tb
        # Rank-1 eigen factors outer[k][i,j] = u[i,k]*uinv[k,j], built once
        # per tree; each entry's probability matrix is their expd-weighted
        # sum — a few sub-register ops, amortized over every site lane.
        outer = [
            (u_ref[tb, :, k:k + 1] * uinv_ref[tb, k:k + 1, :])[None]
            for k in range(4)
        ]                                                  # 4x [1, 4, 4]
        lam_row = lam_ref[tb:tb + 1, :]                    # [1, 4]
        rates_col = rates_ref[tb:tb + 1, :].reshape(R, 1)  # [R, 1]

        def pmat(k):
            """P = max(U diag(exp(lam*t_k*rate)) U^-1, 0), [R, 4, 4]."""
            expd = jnp.exp(rates_col * (lengths_ref[k, t] * lam_row))
            # NB: slice-then-expand (a fused slice+newaxis getitem lowers
            # to a gather, which Mosaic can't lower inside fori_loop).
            p = sum(
                expd[:, j:j + 1].reshape(R, 1, 1) * outer[j]
                for j in range(4))
            return jnp.maximum(p, 0.0)

        scale[...] = jnp.zeros_like(scale)

        # --- unified post-order schedule walk ---------------------------
        # Every entry applies one branch's message to a parent slot.
        # Renormalization runs on every renorm_stride-th entry only: any
        # residual un-normalized factor stays inside the updated partial
        # and is captured exactly by log(lik) at the root, so thinning is
        # an identity — its only job is keeping f32 partials out of the
        # subnormal range, and message entries are bounded by ~1 (row-
        # stochastic P x normalized child), so a few un-renormalized
        # multiplies cannot underflow anything a renormalized chain
        # wouldn't (the deep-tree f32 bound in tests/test_precision.py
        # guards the accumulated error).  The renorm (max+div+log+
        # accumulate) is a large share of an entry: thinning measured
        # 164.6 -> 148.6 ms per 2048-tree production-depth step (+10.8%).
        def entry_body(k, _):
            src = topo_ref[k, t]
            enc = topo_ref[n_entries + k, t]
            p = enc >> 2
            first = (enc >> 1) & 1
            is_tip = enc & 1
            pm = pmat(k)

            def finish(msg):
                """Store or multiply into the parent slot (first flag),
                renormalizing on the stride."""
                def store(upd):
                    if unroll:   # k static: the stride check folds away
                        if k % renorm_stride == renorm_stride - 1:
                            normed, logm = renorm(upd)
                            partials[pl.ds(p, 1)] = normed[None]
                            scale[...] += logm
                        else:
                            partials[pl.ds(p, 1)] = upd[None]
                        return

                    @pl.when(k % renorm_stride == renorm_stride - 1)
                    def _store_renormed():
                        normed, logm = renorm(upd)
                        partials[pl.ds(p, 1)] = normed[None]
                        scale[...] += logm

                    @pl.when(k % renorm_stride != renorm_stride - 1)
                    def _store_plain():
                        partials[pl.ds(p, 1)] = upd[None]

                @pl.when(first == 1)
                def _first():
                    # Fresh slot (or in-place transform: src == p); the
                    # old content is never read.
                    store(msg)

                @pl.when(first == 0)
                def _multiply():
                    store(partials[pl.ds(p, 1)][0] * msg)

            @pl.when(is_tip == 1)
            def _tip():
                code = codes_ref[pl.ds(src, 1)]            # [1, 1, Xb]
                # msg[r,i,x] = P[r,i,code[x]]; code >= 4 (N) -> exact ones
                # (treatAmbiguousAsGap: ambiguous tips contribute nothing).
                msg = sum(
                    pm[:, :, j:j + 1] * (code == j).astype(jnp.float32)
                    for j in range(4)
                ) + (code >= 4).astype(jnp.float32)        # [R, 4, Xb]
                finish(msg)

            @pl.when(is_tip == 0)
            def _edge():
                pc = partials[pl.ds(src, 1)][0]            # [R, 4, Xb]
                msg = sum(
                    pm[:, :, j:j + 1] * pc[:, j:j + 1, :]
                    for j in range(4))
                finish(msg)

            return 0

        loop(n_entries, entry_body)

        # --- root: stationary mix, rate mix ------------------------------
        r = topo_ref[2 * n_entries, t]
        root = partials[pl.ds(r, 1)][0]                    # [R, 4, Xb]
        lik = sum(pi_ref[tb, i] * root[:, i, :] for i in range(4))
        per_rate = jnp.log(lik) + scale[...]               # [R, Xb]
        mx = jnp.max(per_rate, axis=0, keepdims=True)      # [1, Xb]
        # Zero-likelihood sites (e.g. conflicting tips across a length-0
        # edge) make every per_rate entry -inf; subtracting a finite 0
        # instead of -inf keeps exp() at 0 so the mix is -inf, not NaN.
        safe_mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        mix = mx + jnp.log(
            jnp.sum(jnp.exp(per_rate - safe_mx), axis=0, keepdims=True))
        out_ref[pl.ds(tb, 1), :] = mix - jnp.log(
            jnp.asarray(n_rates, jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("n_slots", "trees_per_block", "site_block", "unroll",
                     "interpret", "renorm_stride"))
def _pruning_chunk(
    topo_c, lengths_c, codes, u_c, uinv_c, lam_c, rates_c, pi_c, *,
    n_slots: int, trees_per_block: int, site_block: int, unroll: bool,
    interpret: bool, renorm_stride: int = 4,
):
    """One SMEM-sized tree chunk through the pruning kernel.

    Module-level jit so the kernel function is TRACED ONCE per shape:
    tracing the kernel costs ~0.7 s at production depth, and the chunked
    ensemble step calls it up to ~20 times — as a bare function that was
    ~13 s of pure tracing inside every enclosing jit trace (measured
    round 4); as an inner jit the later calls hit the trace cache.
    """
    TB, Xb = trees_per_block, site_block
    Tcc = u_c.shape[0]
    n_rows, _, Xp = codes.shape
    R = rates_c.shape[1]
    n_xblocks = Xp // Xb
    n_entries = lengths_c.shape[0]

    kernel = functools.partial(
        _kernel, trees_per_block=TB, n_entries=n_entries, n_rates=R,
        unroll=unroll, renorm_stride=renorm_stride,
    )

    def block(shape, site_axis=None, tree_axis=0):
        def index_map(i, j, *_):
            idx = [0] * len(shape)
            if tree_axis is not None:
                idx[tree_axis] = i
            if site_axis is not None:
                idx[site_axis] = j
            return tuple(idx)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tcc // TB, n_xblocks),
            in_specs=[
                block((n_rows, 1, Xb), site_axis=2, tree_axis=None),
                block((TB, 4, 4)),
                block((TB, 4, 4)),
                block((TB, 4)),
                block((TB, R)),
                block((TB, 4)),
            ],
            out_specs=block((TB, Xb), site_axis=1),
            scratch_shapes=[
                pltpu.VMEM((n_slots, R, 4, Xb), jnp.float32),
                pltpu.VMEM((R, Xb), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Tcc, Xp), jnp.float32),
        interpret=interpret,
    )(topo_c, lengths_c, codes, u_c, uinv_c, lam_c, rates_c, pi_c)


@functools.partial(
    jax.jit,
    static_argnames=("n_slots", "trees_per_block", "interpret",
                     "renorm_stride"))
def site_log_likelihoods_pallas(
    eig,                      # GTREigen pytree, u/u_inv [T,4,4], lam [T,4]
    pi: jnp.ndarray,          # [T, 4]
    rates: jnp.ndarray,       # [T, R]
    row_codes: jnp.ndarray,   # [n_rows, X] int32 xMSA rows (shared)
    sched_src: jnp.ndarray,   # [T, N] int32 (xMSA row / live child slot)
    sched_penc: jnp.ndarray,  # [T, N] int32 parent*4 + first*2 + is_tip
    sched_len: jnp.ndarray,   # [T, N] branch lengths
    sched_root: jnp.ndarray,  # [T] int32 live slot of the root partial
    n_slots: int,
    trees_per_block: int = 8,
    interpret: bool = False,
    renorm_stride: int = 4,
) -> jnp.ndarray:
    """Per-site rate-mixed log-likelihoods [T, X] for a scheduled batch.

    Inputs come from io.schedule.build_schedule (slot-reuse schedules);
    n_slots is the schedule's live-slot count incl. the sink.
    """
    T, N = sched_src.shape
    n_rows, X = row_codes.shape
    if rates.shape[1] == 1:
        # R=1 trips a Mosaic limitation ([1,1,1]->[1,4,4] broadcasts in
        # sublanes and lanes at once); duplicating the category is an
        # exact identity — the final mix averages over categories, and
        # averaging two copies of the same rate changes nothing.
        rates = jnp.concatenate([rates, rates], axis=1)
    R = rates.shape[1]
    f32 = jnp.float32
    TB = trees_per_block

    # Site-block width: the largest 128-multiple whose per-tree partials
    # scratch + shared codes block stays under the cap.  With slot reuse
    # n_slots is ~log2(tips), so Xb covers production xMSAs in one block;
    # when several blocks are needed they are equalized so the last one
    # is not a second compiled shape.
    Xp = _round_up(X, 128)
    # bytes/column: partials scratch (4->8 sublane pad) + the shared
    # xMSA-row codes block (1->8 sublane pad).
    per_col = n_slots * R * 8 * 4 + n_rows * 8 * 4
    Xb = max(128, min(Xp, (_SCRATCH_BYTES // per_col) // 128 * 128))
    n_xblocks = -(-Xp // Xb)
    Xb = _round_up(-(-Xp // n_xblocks), 128)
    Xp = n_xblocks * Xb

    # Tree-chunk size: the SMEM tables are (2N+1) int32 + N f32 per tree.
    smem_per_tree = ((2 * N + 1) + N) * 4
    Tc = max(TB, (_SMEM_BYTES // smem_per_tree) // TB * TB)
    Tp = _round_up(T, TB)

    def pad(a, total, axis=0, fill=0):
        n = total - a.shape[axis]
        if n <= 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, n)
        return jnp.pad(a, widths, constant_values=fill)

    # Padded sites get code 4 (N): all-ones partials, site loglik 0.
    # [n_rows, 1, Xp]: the singleton sublane axis keeps n_rows a LEADING
    # (untiled) dim so the kernel's dynamic per-tip row lookup is legal.
    codes = pad(row_codes.astype(jnp.int32), Xp, axis=1, fill=4)[:, None, :]
    u = pad(eig.u.astype(f32), Tp)
    uinv = pad(eig.u_inv.astype(f32), Tp)
    lam = pad(eig.lam.astype(f32), Tp)
    rates_p = pad(rates.astype(f32), Tp)
    pi_p = pad(pi.astype(f32), Tp)
    lengths = pad(sched_len.astype(f32), Tp).T          # [N, Tp]
    # Batch-padding trees: every entry re-stores a one-hot into the sink
    # (penc = sink*4 + 2 + 1, length 0) and their root reads slot 0; the
    # resulting rows are sliced off below.
    pad_penc = (n_slots - 1) * 4 + 2 + 1
    topo = jnp.concatenate(
        [
            pad(sched_src.astype(jnp.int32), Tp).T,
            pad(sched_penc.astype(jnp.int32), Tp, fill=pad_penc).T,
            pad(sched_root.astype(jnp.int32), Tp)[None, :],
        ],
        axis=0,
    )                                                   # [2N + 1, Tp]

    def run_chunk(args):
        topo_c, lengths_c, u_c, uinv_c, lam_c, rates_c, pi_c = args
        return _pruning_chunk(
            topo_c, lengths_c, codes, u_c, uinv_c, lam_c, rates_c, pi_c,
            n_slots=n_slots, trees_per_block=TB, site_block=Xb,
            renorm_stride=renorm_stride,
            # Unrolled post-order loops schedule ~25% faster but the code
            # size scales with tree depth; cap the unroll at small trees.
            unroll=N <= 64,
            interpret=interpret,
        )

    if Tp <= Tc:
        out = run_chunk((topo, lengths, u, uinv, lam, rates_p, pi_p))
        return out[:T, :X]

    # Chunk the tree batch so the SMEM tables fit.  Chunk sizes are
    # equalized (pad the tree axis, then split evenly) so every
    # pallas_call shares ONE compiled (grid, blockspec) shape — a ragged
    # tail chunk would pay a second Mosaic compile (~25 s at production
    # shapes).  Padded trees carry no-op schedules and are sliced off.
    n_chunks = -(-Tp // Tc)
    Tc_eq = _round_up(-(-Tp // n_chunks), TB)
    Tp2 = n_chunks * Tc_eq
    topo = pad(topo, Tp2, axis=1)
    # (src rows padded with 0 and penc rows with 0 = slot-0 store of a
    # tip; harmless for never-read padded trees, but keep the sink
    # convention for uniformity with the first padding pass.)
    lengths = pad(lengths, Tp2, axis=1)
    u, uinv, lam = pad(u, Tp2), pad(uinv, Tp2), pad(lam, Tp2)
    rates_p, pi_p = pad(rates_p, Tp2), pad(pi_p, Tp2)
    outs = []
    for start in range(0, Tp2, Tc_eq):
        sl = slice(start, start + Tc_eq)
        outs.append(run_chunk((
            topo[:, sl], lengths[:, sl], u[sl], uinv[sl],
            lam[sl], rates_p[sl], pi_p[sl])))
    return jnp.concatenate(outs, axis=0)[:T, :X]
