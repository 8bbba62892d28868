"""Fused Pallas stage-3 sweep engine: whole sweep chunks in one kernel.

Why this exists.  The XLA stage-3 hot loop (kernels/rjmcmc.py) lowers one
sweep to ~a hundred small VPU ops over [S]-shaped arrays; every op round-
trips its operands through HBM, so at 32768 chains the sweep is bound by
*intermediate* HBM traffic, not by arithmetic — measured throughput is flat
from 32k to 1M chains (~320M chain-sweeps/s on one v5e chip) while the
useful state is only ~40 bytes/chain.  This kernel runs an entire
``sweep_chunk`` of sweeps inside a single ``pallas_call``: chain state
lives in VMEM (registers, effectively) for the whole chunk, HBM sees one
read and one write of the state per *chunk* instead of hundreds per
*sweep*, and the loop becomes pure VPU arithmetic.

Layout (the part that matters on TPU): chains are **vector lanes**.  Every
per-chain quantity is an ``(8, W)`` tile — 8 sublanes x W lanes, W a
multiple of 128 — and every per-coordinate / per-model / per-component
quantity is a small Python-unrolled tuple of such tiles.  The proposal
tables (automix.c's ``proposalDist``) are scalars in SMEM; model/component
selection is mask arithmetic (``k == m``), never a gather — the same
gather-free design as the XLA path, with the one-hot contractions replaced
by unrolled scalar*vector FMAs.

The move itself is the reference's ``reversible_jump_move``
(automix.c:1035-1288) exactly as the XLA path implements it: block /
componentwise within-model RWM on a 1-in-10 schedule, mixture allocation,
standardize via the inverse Cholesky factor, destination draw, latent
dimension-matching (the padded coordinates *are* the extra latent draws),
de-standardize, reverse allocation, one MH accept, and the pk diminishing
adaptation with the re-init safeguard.  Model densities are the
``Model.logp_cols`` column forms (everything elementwise over lanes, no
``gammaln`` — ops/plmath.py).

Randomness: two in-kernel sources, selected statically.

* ``hw`` — the TPU core hardware PRNG (``pltpu.prng_random_bits``), seeded
  per (engine seed, chunk-start sweep, global block index); the stream
  advances sequentially over the chunk's sweeps.  Near-free, used on real
  TPU.  Resumable at chunk granularity (a run chunked the same way
  reproduces bitwise).
* ``hash`` — the same triple32^lowbias32 counter hash as the XLA "fast"
  mode (ops/randoms.py): every word is a pure function of (seed, global
  sweep, global chain, slot).  Sweep-granular resumable and bitwise
  identical between compiled TPU and interpret mode — the testing path,
  and ~20% slower than ``hw`` on TPU.

Eligibility is checked by :func:`fused_eligible`; the sampler falls back
to the XLA chunk runner for anything the kernel does not cover (per-sweep
traces at stride 1 — decimated traces run fused, config.trace_every —
HMC moves, triangular unrolls beyond the VMEM/trace budget).  Student-t
runs ARE covered: perturbations come from Bailey's exact polar inversion
(rejection-free, fixed op count) and the latent Jacobian uses the t
log-density.  Pooled pk IS covered at any scale: a single lane block
does the global-histogram update as an in-kernel cross-lane reduction;
multi-block and sharded runs take the semi-fused per-sweep runner
(``_compiled_pooled`` — one-sweep kernels scanned with the shared
Robbins-Monro update between, exact integer psums).  Meshes ARE covered:
under ``shard_map`` each shard runs its own blocks with globally-indexed
RNG streams and the chunk statistics reduce with one psum.  Dimensions
up to 16 ARE covered (true-dim unroll budgets); matmul-heavy densities
plug in through the FusedColsDensity protocol (:func:`make_density`)
with VMEM-cached per-lane state — see models/ddi_cols.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from automix_tpu.config import EngineConfig, LOG_ACCEPT_CLAMP, NEG_INF
from automix_tpu.ops.plmath import HALF_LOG_2PI
from automix_tpu.state import Chains, Proposal

_LOG_2PI = 1.8378770664093453
_U = jnp.uint32
_TWO_PI = 6.283185307179586

# Max lanes per grid block (chains per kernel instance): 8 sublanes x 512.
_MAX_BLK = 4096
# Unroll budget on the triangular standardize/de-standardize loops: the
# kernel emits ~4 x L x sum_m d_m(d_m+3)/2 vector ops per sweep for the
# allocation passes; beyond this the Mosaic trace blows up.  (The budget
# uses each model's TRUE dim, not dmax — a K=2 family at dims 16/10 costs
# a fraction of K*L*dmax^2.)
_MAX_TRI = 8192
_MAX_D = 16
# Sweeps between full-density refreshes of an incremental cache (models
# with a FusedColsDensity): bounds float32 drift of the incrementally
# updated sufficient statistics to a handful of sweeps.
_REFRESH = 16


def _triple32(x):
    x = x ^ (x >> 17)
    x = x * _U(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * _U(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * _U(0x31848BAB)
    return x ^ (x >> 14)


def _lowbias32(x):
    x = x ^ (x >> 16)
    x = x * _U(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * _U(0x846CA68B)
    return x ^ (x >> 16)


def _u01(bits_u32):
    """uint32 words -> float32 uniforms strictly inside (0, 1): top 24
    bits + half-ulp (uint->float casts are unsupported in Mosaic, so the
    logical-shifted top bits go through an int32 cast).

    The largest value the formula produces, 1 - 2^-25, rounds to exactly
    1.0 in float32 (24-bit mantissa), which would blow up log1p(-u) in
    Box-Muller / Gumbel once every 2^24 draws — at 131k chains x 50k
    sweeps that is ~10^3 poisoned draws per run — so clamp to the largest
    float32 strictly below 1."""
    top24 = pltpu.bitcast(bits_u32 >> 8, jnp.int32)
    u = top24.astype(jnp.float32) * np.float32(2.0 ** -24) \
        + np.float32(2.0 ** -25)
    return jnp.minimum(u, np.float32(1.0 - 2.0 ** -24))


def _gumbel(u):
    return -jnp.log(-jnp.log1p(-u) + 1e-38)


def _accept(delta):
    return jnp.exp(jnp.clip(delta, LOG_ACCEPT_CLAMP, 0.0))


def choose_block(n_chains: int, n_tiles: int = 0) -> int:
    """Largest power-of-two block <= _MAX_BLK dividing the chain count
    whose VMEM working set fits the 16 MB scoped limit.

    ``n_tiles`` estimates the live per-lane float32 tiles of the sweep
    body (state carry + the K*L*D standardized-residual tiles + random
    words); Mosaic roughly doubles it with block double-buffering and
    transients, so the budget targets half the scoped limit.  Minimum
    block 1024 (= 8 sublanes x 128 lanes, one full float32 tile); the
    eligibility check requires n_chains % 1024 == 0."""
    budget = 8 * 1024 * 1024
    blk = _MAX_BLK
    while blk > 1024 and (n_chains % blk != 0
                          or (n_tiles and n_tiles * 4 * blk > budget)):
        blk //= 2
    return blk


def make_logpost_cols(modelset):
    """Column-form family log-posterior ``(mks, rows) -> lp`` shared by the
    fused stage-3 sweep and fused stage-1 kernels.

    ``mks`` is the list of K per-lane 0/1 model-mask tiles, ``rows`` the
    dmax per-coordinate lane tiles.  With a hand-batched family kernel
    (``ModelSet.batched_logpost_cols``) one evaluation covers all lanes;
    otherwise every model's ``logp_cols`` branch is evaluated and
    mask-selected.  Densities are sanitized to a finite range (NaN/inf ->
    NEG_INF) so arithmetic mask-blends can never see 0 * inf."""
    K = modelset.nmodels
    dims = tuple(int(d) for d in modelset.dims)
    branches = [m.logp_cols for m in modelset.models]
    batched_cols = getattr(modelset, "batched_logpost_cols", None)

    def logpost_cols(mks, rows):
        if batched_cols is not None:
            lp = batched_cols(mks, rows)
            lp = jnp.minimum(jnp.maximum(lp, NEG_INF), -NEG_INF)
            return jnp.where(lp == lp, lp, NEG_INF)
        out = None
        for m in range(K):
            lp = branches[m](rows[:dims[m]])
            lp = jnp.minimum(jnp.maximum(lp, NEG_INF), -NEG_INF)
            lp = jnp.where(lp == lp, lp, NEG_INF)     # NaN -> reject
            term = lp if K == 1 else mks[m] * lp
            out = term if out is None else out + term
        return out

    return logpost_cols


class _StatelessDensity:
    """Default FusedColsDensity wrapping a stateless column density: no
    cache, no tables, every evaluation is a fresh ``logpost_cols`` call
    (bitwise identical to the pre-interface kernel)."""

    n_cache = 0

    def __init__(self, logpost_cols):
        self._cols = logpost_cols

    def table_arrays(self, ndim: int):
        return ()

    def full(self, mks, rows, tabs=()):
        return self._cols(mks, rows), ()

    def coord(self, j, mks, rows, old_j, cache, tabs=()):
        return self._cols(mks, rows), ()


def make_density(modelset):
    """The fused kernel's density object.

    A model set may supply ``fused_density`` — an object with ``n_cache``
    (summed per-lane float32 cache slots, for VMEM accounting),
    ``table_arrays(ndim) -> tuple[np.ndarray]`` (static coefficient
    tables, shaped with ``ndim`` trailing broadcast dims — the kernel
    plumbs them in as VMEM inputs because Pallas kernels cannot capture
    array constants), ``full(mks, rows, tabs) -> (lp, cache)`` (fresh
    evaluation + fresh cache) and ``coord(j, mks, rows, old_j, cache,
    tabs) -> (lp, cache')`` (evaluation after ONLY coordinate j changed
    from ``old_j`` to ``rows[j]``, reusing/updating the cache; leaves it
    did not touch must be returned as the SAME objects so the kernel can
    skip their accept-blends).  This is how matmul-heavy likelihoods
    (e.g. the DDI sufficient-statistic class form, models/ddi_cols.py)
    amortize their alpha-feature contraction across the componentwise
    sweep instead of paying it per coordinate.  Everything else wraps its
    ``logp_cols`` in the stateless adapter."""
    density = getattr(modelset, "fused_density", None)
    if density is not None:
        return density
    return _StatelessDensity(make_logpost_cols(modelset))


def _est_tiles(modelset, L: int) -> int:
    """Estimated live per-lane float32 tiles of the sweep body (used for
    VMEM-aware block sizing and the pooled-pk single-block check).  The
    w_ml standardized-residual tiles count each model's TRUE dim.  An
    incremental density's cache counts 4x: besides the carried cache,
    the block/comp cond branches, the RJ full evaluation, and the
    refresh branch each hold a fresh candidate copy, and Mosaic's stack
    allocator keeps them live simultaneously (measured: the DDI kernel's
    scoped VMEM is ~4x n_cache x lane bytes; a 1x estimate OOM'd the
    v5e's 16 MB scoped limit at block 4096)."""
    K, D = modelset.nmodels, modelset.dmax
    w_tiles = L * int(sum(int(d) for d in modelset.dims))
    n_cache = getattr(getattr(modelset, "fused_density", None),
                      "n_cache", 0)
    return (w_tiles + 4 * n_cache + 2 * K * D + 2 * K + 3 * D
            + (3 * D + 2 * L + K + 1) + 60)


def fused_supported(modelset, cfg: EngineConfig) -> bool:
    """Static feature check (independent of proposal size / call mode)."""
    has_cols = (getattr(modelset, "fused_density", None) is not None
                or getattr(modelset, "batched_logpost_cols", None) is not None
                or all(m.logp_cols is not None for m in modelset.models))
    return (
        has_cols
        and cfg.dtype == jnp.float32
        and cfg.within_move == "rwm"
        and cfg.pk_mode in ("per_chain", "pooled")
        and modelset.dmax <= _MAX_D
    )


def fused_eligible(modelset, cfg: EngineConfig, collect: bool, mesh,
                   lmax: int) -> bool:
    """Full eligibility for a concrete runner: static support + no traces
    + an unroll budget on the triangular loops + a VMEM floor.  With a
    mesh the kernel runs per shard under shard_map (chunk statistics
    psum'd), so every shard's local chain count must tile into 8x128 lane
    blocks."""
    if cfg.fused == "off" or collect:
        return False
    if not fused_supported(modelset, cfg):
        return False
    n_shards = int(mesh.devices.size) if mesh is not None else 1
    if cfg.n_chains % (n_shards * 1024) != 0:
        return False
    L = max(lmax, 1)
    tri = sum(int(d) * (int(d) + 3) // 2 for d in modelset.dims)
    if L * tri > _MAX_TRI:
        return False
    # even the minimum 1024-lane block must fit the VMEM budget
    if _est_tiles(modelset, L) * 4 * 1024 > 8 * 1024 * 1024:
        return False
    if cfg.pk_mode == "pooled":
        # The shared pk updates from the global per-sweep visit histogram
        # (automix.c:1258-1267); inside the kernel that is a cross-lane
        # reduction, which only sees the whole chain population when all
        # chains live in ONE lane block on one shard.  Multi-block and
        # sharded pooled runs use the semi-fused per-sweep runner instead
        # (build_pooled_sweep_runner) — also eligible.
        pass
    if cfg.fused == "auto":
        return jax.devices()[0].platform == "tpu"
    return True  # "on": forced (interpret off-TPU)


def pooled_single_block(modelset, cfg: EngineConfig, mesh, lmax: int) -> bool:
    """True when a pooled-pk run fits ONE lane block on one unsharded
    device, i.e. the fully-fused kernel can do the pooled update as an
    in-kernel cross-lane reduction; larger/sharded pooled runs take the
    semi-fused per-sweep runner."""
    if mesh is not None:
        return False
    S = cfg.n_chains
    return choose_block(S, _est_tiles(modelset, max(lmax, 1))) == S


def build_fused_chunk_runner(modelset, cfg: EngineConfig, burning: bool,
                             mesh=None):
    """Build ``runner(chains, prop, n_sweeps) -> (chains', chunk_stats)``
    with the same chunk-stats contract as the XLA runner
    (rjmcmc._chunk_scan with ``collect=False``).

    With ``mesh`` the kernel runs per shard under ``shard_map`` over the
    chain axis: every shard drives its own local lane blocks, RNG streams
    are seeded by *global* block / chain indices (shard offset via
    ``lax.axis_index``, the sweep_rng.py contract), and the per-shard
    chunk statistics are reduced with one ``psum`` — trajectories are
    therefore independent of the mesh layout for a fixed block size."""
    K, D = modelset.nmodels, modelset.dmax
    dims = tuple(int(d) for d in modelset.dims)    # static per-model dims
    adapt = cfg.adapt and not burning
    interpret = jax.devices()[0].platform != "tpu"
    rng_mode = cfg.fused_rng
    if rng_mode == "auto":
        rng_mode = "hash" if interpret else "hw"
    if interpret and rng_mode == "hw":
        raise ValueError("fused_rng='hw' needs a real TPU (the Mosaic "
                         "interpreter does not emulate the hardware PRNG)")
    seed_static = int(cfg.seed)

    # Student-t perturbations (student_T_dof, automix.c:1663-1680): the
    # latent filler density becomes ltprob (automix.c:1717-1725), whose
    # constant is computed at trace time (dof is static).
    dof = int(cfg.student_t_dof)
    if dof > 0:
        import math
        _lt_const = np.float32(
            math.lgamma(0.5 * (dof + 1)) - math.lgamma(0.5 * dof)
            - 0.5 * math.log(dof * math.pi))
        _dof_f = np.float32(dof)

    def lat_lpdf(w):
        """Log-density of one latent filler coordinate: N(0,1) or t(dof)
        (randoms.latent_log_pdf, the XLA path's form)."""
        if dof > 0:
            return _lt_const - np.float32(0.5 * (dof + 1)) \
                * jnp.log1p(w * w * np.float32(1.0 / dof))
        return -0.5 * w * w - HALF_LOG_2PI

    density = make_density(modelset)
    NC = density.n_cache

    def lse_list(ls):
        m = ls[0]
        for v in ls[1:]:
            m = jnp.maximum(m, v)
        s = jnp.exp(ls[0] - m)
        for v in ls[1:]:
            s = s + jnp.exp(v - m)
        return m + jnp.log(s)

    def gumbel_argmax(logits, gums, zeros_i32):
        best = logits[0] + gums[0]
        idx = zeros_i32
        for i in range(1, len(logits)):
            v = logits[i] + gums[i]
            better = v > best
            best = jnp.where(better, v, best)
            idx = jnp.where(better, i, idx)
        return idx

    pooled_pk = cfg.pk_mode == "pooled"

    @functools.lru_cache(maxsize=None)
    def _built(n_sweeps: int, L: int, S: int, in_adapt: bool):
        """Trace the pallas kernel for an ``n_sweeps`` chunk over ``S``
        local chains.  ``in_adapt``: do the pk diminishing adaptation
        inside the kernel (the fully-fused mode); False leaves pk frozen
        for the semi-fused pooled runner, which adapts the shared pk
        between per-sweep calls.  Returns (call, BLK, W, G, G8)."""
        BLK = choose_block(S, _est_tiles(modelset, L))
        if pooled_pk and in_adapt and BLK != S:
            raise ValueError(
                f"in-kernel pooled pk needs all {S} chains in one lane "
                f"block (got block {BLK}); the runner should have taken "
                "the semi-fused per-sweep path")
        W = BLK // 8
        G = S // BLK
        G8 = G * 8
        # Per-sweep random word slots (rjmcmc.rand_slots analogue).
        s_urwm = 0                      # D words: componentwise/block accepts
        s_uacc = D                      # 1 word: RJ accept
        s_gall = D + 1                  # L words: forward allocation gumbels
        s_gmod = s_gall + L             # K words: destination-model gumbels
        s_gcmp = s_gmod + K             # L words: destination-component
        s_perm = s_gcmp + L             # D words: latent permutation keys
        # Perturbation words: dof == 0 draws both the RWM and the latent
        # normals from D Box-Muller pairs (cos/sin are independent); with
        # Student-t the cos/sin components of one Bailey polar pair are
        # *dependent* (they are a bivariate t), so each stream gets its
        # own D pairs.
        s_bm = s_perm + (D if cfg.perm else 0)
        NW = s_bm + (4 * D if dof > 0 else 2 * D)

        tabs_np = density.table_arrays(2)       # (8, W) tiles -> ndim 2
        n_tabs = len(tabs_np)

        def kernel(scal_ref, k_ref, th_ref, lp_ref, pk_ref, pkl_ref,
                   nri_ref, sig_ref, loglam_ref, abase_ref, logdet_ref,
                   mu_ref, binv_ref, b_ref, *rest):
            tabs = tuple(rest[:n_tabs])
            (k_o, th_o, lp_o, pk_o, pkl_o, nri_o,
             ks_o, ts_o, tq_o, cnt_o) = rest[n_tabs:]
            g = pl.program_id(0)
            sweep0 = scal_ref[1]
            # scal_ref[2]: global index of this shard's first block;
            # scal_ref[3]: global index of its first chain (0 unsharded).
            if rng_mode == "hw":
                pltpu.prng_seed(
                    scal_ref[0]
                    + (scal_ref[2] + g + 1) * jnp.int32(-1640531527),
                    sweep0)
            else:
                sub = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
                lane = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
                chain_id = scal_ref[3] + (g * 8 + sub) * W + lane
                cbase = chain_id.astype(_U) * _U(NW)

            def draw_words(t):
                """[NW, 8, W] uint32 random words for sweep t."""
                if rng_mode == "hw":
                    return pltpu.bitcast(
                        pltpu.prng_random_bits((NW, 8, W)), _U)
                seed_u = _U(seed_static & 0xFFFFFFFF)
                sweep_u = t.astype(_U)
                salt1 = _triple32(sweep_u ^ (seed_u * _U(0x9E3779B9)))
                salt2 = _lowbias32(sweep_u + _U(0x85EBCA6B)
                                   + seed_u * _U(0xC2B2AE35))
                woff = jax.lax.broadcasted_iota(
                    jnp.int32, (NW, 8, W), 0).astype(_U)
                c = cbase[None, :, :] + woff
                return _triple32(c ^ salt1) ^ _lowbias32(c + salt2)

            # -- load state into VMEM-resident values ---------------------
            kk0 = k_ref[:]
            th0 = tuple(th_ref[d] for d in range(D))
            lp0 = lp_ref[:]
            pk0 = tuple(pk_ref[m] for m in range(K))
            pkl0 = pkl_ref[:]
            nri0 = nri_ref[:]
            zi = jnp.zeros((8, W), jnp.int32)
            zf = jnp.zeros((8, W), jnp.float32)
            ks0 = (zi,) * K
            ts0 = (zf,) * (K * D)
            tq0 = (zf,) * (K * D)
            cnt0 = (zi,) * 6
            if NC:
                # fresh incremental-density cache for the chunk's start
                # state (a chunk boundary is also a drift refresh)
                mks_in = [(kk0 == m).astype(jnp.float32) for m in range(K)]
                _, cache0 = density.full(mks_in, th0, tabs)
            else:
                cache0 = ()

            def body(t_rel, carry):
                (kk, logp, th, pk, pkl, nri, cache, ks, ts, tq,
                 cnt) = carry
                t = sweep0 + t_rel
                words = draw_words(t)
                u_rwm = [_u01(words[s_urwm + d]) for d in range(D)]
                u_acc = _u01(words[s_uacc])
                g_all = [_gumbel(_u01(words[s_gall + i])) for i in range(L)]
                g_mod = [_gumbel(_u01(words[s_gmod + i])) for i in range(K)]
                g_cmp = [_gumbel(_u01(words[s_gcmp + i])) for i in range(L)]
                z_rwm, z_lat = [], []
                if dof > 0:
                    # Bailey (1994) polar inversion, exact and branch-free:
                    # with U, V ~ U(0,1),
                    #   sqrt(dof (U^{-2/dof} - 1)) cos(2 pi V)  ~  t_dof.
                    # Replaces the reference's rejection-sampled
                    # gauss/chi2 ratio (rt, automix.c:1663-1680) with a
                    # fixed op count; draws are independent per
                    # coordinate (the documented rand_t deviation from
                    # the reference's shared-denominator rt).
                    def t_draw(u1, u2):
                        r = jnp.sqrt(_dof_f * (jnp.exp(
                            np.float32(-2.0 / dof) * jnp.log(u1)) - 1.0))
                        return r * jnp.cos(_TWO_PI * u2)
                    for d in range(D):
                        z_rwm.append(t_draw(_u01(words[s_bm + d]),
                                            _u01(words[s_bm + D + d])))
                        z_lat.append(t_draw(_u01(words[s_bm + 2 * D + d]),
                                            _u01(words[s_bm + 3 * D + d])))
                else:
                    for d in range(D):
                        u1 = _u01(words[s_bm + d])
                        u2 = _u01(words[s_bm + D + d])
                        r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
                        ang = _TWO_PI * u2
                        z_rwm.append(r * jnp.cos(ang))
                        z_lat.append(r * jnp.sin(ang))

                mks = [(kk == m).astype(jnp.float32) for m in range(K)]

                def selk(tab_read):
                    """Per-lane select of a per-model scalar table."""
                    out = None
                    for m in range(K):
                        v = mks[m] * tab_read(m)
                        out = v if out is None else out + v
                    return out

                # masked per-(lane, coord) RWM scale: models whose dim does
                # not reach coordinate d contribute 0 (mask built into the
                # sum over models).
                sig_k = [sum(mks[m] * sig_ref[m, d]
                             for m in range(K) if dims[m] > d)
                         for d in range(D)]
                active = [sum(mks[m] for m in range(K) if dims[m] > d)
                          for d in range(D)]

                # ---- (a) within-model move (automix.c:1054-1085) --------
                def block_move(args):
                    th, logp, cache = args
                    prop = tuple(th[d] + sig_k[d] * z_rwm[d]
                                 for d in range(D))
                    lpn, cache_n = density.full(mks, prop, tabs)
                    # Arithmetic blends beat selects by ~15% here, and are
                    # safe because every operand is provably finite: draws
                    # are clamped (_u01), densities sanitized
                    # (logpost_cols / the density's own clamp), tables
                    # finite -> 0 * x never sees an inf/NaN.  (With
                    # unclamped draws a rejected inf proposal WOULD poison
                    # the carry via 0 * inf.)
                    acc = (u_rwm[0] < _accept(lpn - logp)).astype(
                        jnp.float32)
                    th = tuple(th[d] + acc * (prop[d] - th[d])
                               for d in range(D))
                    logp = logp + acc * (lpn - logp)
                    cache = tuple(c + acc * (cn - c)
                                  for c, cn in zip(cache, cache_n))
                    return (th, logp, cache,
                            acc.astype(jnp.int32), zi + 1, zi, zi)

                def comp_move(args):
                    th, logp, cache = args
                    nacc = zi
                    ntry = zi
                    for j in range(D):
                        prop = tuple(th[d] + (sig_k[d] * z_rwm[d]
                                              if d == j else 0.0)
                                     for d in range(D))
                        lpn, cache_n = density.coord(j, mks, prop, th[j],
                                                     cache, tabs)
                        acc = ((u_rwm[j] < _accept(lpn - logp))
                               & (active[j] > 0.0)).astype(jnp.float32)
                        th = tuple(th[d] + acc * (prop[d] - th[d])
                                   for d in range(D))
                        logp = logp + acc * (lpn - logp)
                        # tiles the density did not touch come back as the
                        # SAME objects — skip their accept-blends
                        cache = tuple(c if cn is c else c + acc * (cn - c)
                                      for c, cn in zip(cache, cache_n))
                        nacc = nacc + acc.astype(jnp.int32)
                        ntry = ntry + active[j].astype(jnp.int32)
                    return (th, logp, cache, zi, zi, nacc, ntry)

                do_block = (t % 10) == 0            # automix.c:95,148
                th, logp, cache, naccb, ntryb, naccs, ntrys = jax.lax.cond(
                    do_block, block_move, comp_move, (th, logp, cache))

                # ---- (b) reversible jump (automix.c:1087-1256) ----------
                # Forward allocation: standardized residuals w_{m,l} for
                # every (model, component) — the chain's own model is
                # mask-selected afterwards (automix.c:1093-1135).
                w_ml = []
                logits = [None] * L
                for m in range(K):
                    dm = dims[m]
                    for li in range(L):
                        ml = m * L + li
                        w = []
                        quad = None
                        for i in range(dm):
                            # lower-tri inverse-factor matvec:
                            # w_i = sum_{j<=i} binv[i,j] (th_j - mu_j)
                            acc_w = None
                            for j in range(i + 1):
                                term = binv_ref[ml, i * D + j] \
                                    * (th[j] - mu_ref[ml, j])
                                acc_w = term if acc_w is None \
                                    else acc_w + term
                            w.append(acc_w)
                            quad = acc_w * acc_w if quad is None \
                                else quad + acc_w * acc_w
                        w_ml.append(w)
                        if quad is None:
                            quad = 0.0
                        contrib = mks[m] * (abase_ref[m, li] - 0.5 * quad)
                        logits[li] = contrib if logits[li] is None \
                            else logits[li] + contrib

                l_idx = gumbel_argmax(logits, g_all, zi)
                mls = [(l_idx == li).astype(jnp.float32) for li in range(L)]
                sel_logit = sum(mls[li] * logits[li] for li in range(L))
                log_palloc = sel_logit - lse_list(logits)

                # standardized latent of the selected component (padded
                # coords come from z_lat below — the padding *is* the
                # dimension matching, automix.c:1171-1204)
                work = []
                for d in range(D):
                    acc_w = None
                    for m in range(K):
                        if dims[m] <= d:
                            continue
                        for li in range(L):
                            v = (mks[m] * mls[li]) * w_ml[m * L + li][d]
                            acc_w = v if acc_w is None else acc_w + v
                    work.append(acc_w if acc_w is not None else zf)

                # destination model kn ~ pk, component ln ~ lam[kn]
                if K == 1:
                    kn_idx = kk
                    mkn = mks
                    logratio = zf
                else:
                    logpk = [jnp.log(jnp.maximum(pk[m], 1e-38))
                             for m in range(K)]
                    kn_idx = gumbel_argmax(logpk, g_mod, zi)
                    mkn = [(kn_idx == m).astype(jnp.float32)
                           for m in range(K)]
                    logratio = sum(mks[m] * logpk[m] for m in range(K)) \
                        - sum(mkn[m] * logpk[m] for m in range(K))

                loglam_kn = [sum(mkn[m] * loglam_ref[m, li]
                                 for m in range(K)) for li in range(L)]
                ln_idx = gumbel_argmax(loglam_kn, g_cmp, zi)
                mln = [(ln_idx == li).astype(jnp.float32)
                       for li in range(L)]

                mask_k = active                     # [D] per-lane 0/1
                mask_kn = [sum(mkn[m] for m in range(K) if dims[m] > d)
                           for d in range(D)]

                # latent dimension-matching + Jacobian terms: the "grow"
                # density uses the pre-permutation latent, the "shrink"
                # density the post-permutation one (automix.c:1171-1204;
                # rjmcmc.py applies cfg.perm between the two as well)
                wf = []
                for d in range(D):
                    wf.append(mask_k[d] * work[d]
                              + (1.0 - mask_k[d]) * z_lat[d])
                for d in range(D):
                    up = (1.0 - mask_k[d]) * mask_kn[d]
                    logratio = logratio - up * lat_lpdf(wf[d])
                if cfg.perm:
                    # random permutation of the first max(dim_k, dim_kn)
                    # latent slots (doPerm, automix.c:1184-1194): sort by
                    # per-slot uniform keys, inactive tail keyed 1+coord;
                    # an unrolled bubble network (stable, D<=6) replaces
                    # the XLA path's argsort + take_along_axis.
                    n_act = [jnp.maximum(mask_k[d], mask_kn[d])
                             for d in range(D)]
                    keys = [n_act[d] * _u01(words[s_perm + d])
                            + (1.0 - n_act[d]) * (1.0 + d)
                            for d in range(D)]
                    for _ in range(D):
                        for j in range(D - 1):
                            swap = keys[j] > keys[j + 1]
                            kj = jnp.where(swap, keys[j + 1], keys[j])
                            kj1 = jnp.where(swap, keys[j], keys[j + 1])
                            wj = jnp.where(swap, wf[j + 1], wf[j])
                            wj1 = jnp.where(swap, wf[j], wf[j + 1])
                            keys[j], keys[j + 1] = kj, kj1
                            wf[j], wf[j + 1] = wj, wj1
                for d in range(D):
                    down = mask_k[d] * (1.0 - mask_kn[d])
                    logratio = logratio + down * lat_lpdf(wf[d])

                # de-standardize into the destination model
                # (automix.c:1206-1211)
                wfm = [wf[d] * mask_kn[d] for d in range(D)]
                thn = [None] * D
                for m in range(K):
                    dm = dims[m]
                    for li in range(L):
                        ml = m * L + li
                        sel = mkn[m] * mln[li]
                        for d in range(dm):
                            acc_t = mu_ref[ml, d]
                            for e in range(d + 1):
                                acc_t = acc_t + b_ref[ml, d * D + e] \
                                    * wfm[e]
                            v = sel * acc_t
                            thn[d] = v if thn[d] is None else thn[d] + v
                thn = [thn[d] if thn[d] is not None else zf
                       for d in range(D)]
                thn = [thn[d] * mask_kn[d] for d in range(D)]

                # reverse allocation logits (automix.c:1213-1235)
                logits_n = [None] * L
                for m in range(K):
                    dm = dims[m]
                    for li in range(L):
                        ml = m * L + li
                        quad = None
                        for i in range(dm):
                            acc_w = None
                            for j in range(i + 1):
                                term = binv_ref[ml, i * D + j] \
                                    * (thn[j] - mu_ref[ml, j])
                                acc_w = term if acc_w is None \
                                    else acc_w + term
                            quad = acc_w * acc_w if quad is None \
                                else quad + acc_w * acc_w
                        if quad is None:
                            quad = 0.0
                        contrib = mkn[m] * (abase_ref[m, li] - 0.5 * quad)
                        logits_n[li] = contrib if logits_n[li] is None \
                            else logits_n[li] + contrib
                log_pallocn = sum(mln[li] * logits_n[li]
                                  for li in range(L)) - lse_list(logits_n)

                # accept (automix.c:1237-1256)
                lpn, cache_rj = density.full(mkn, thn, tabs)
                loglam_k_l = sum(mks[m] * mls[li] * loglam_ref[m, li]
                                 for m in range(K) for li in range(L))
                loglam_kn_ln = sum(mkn[m] * mln[li] * loglam_ref[m, li]
                                   for m in range(K) for li in range(L))
                logdet_kl = sum(mks[m] * mls[li] * logdet_ref[m, li]
                                for m in range(K) for li in range(L))
                logdet_kln = sum(mkn[m] * mln[li] * logdet_ref[m, li]
                                 for m in range(K) for li in range(L))
                logratio = (logratio + (lpn - logp)
                            + (log_pallocn - log_palloc)
                            + (loglam_k_l - loglam_kn_ln)
                            + (logdet_kln - logdet_kl))
                accf = (u_acc < _accept(logratio)).astype(jnp.float32)
                acci = accf.astype(jnp.int32)
                kk = kk + acci * (kn_idx - kk)
                th = tuple(th[d] + accf * (thn[d] - th[d])
                           for d in range(D))
                logp = logp + accf * (lpn - logp)
                cache = tuple(c + accf * (cn - c)
                              for c, cn in zip(cache, cache_rj))
                if NC:
                    # Periodic full-density refresh: the incrementally
                    # updated cache (and logp) accumulate float32 rounding
                    # across accepted coordinate moves; recomputing both
                    # from the current state every _REFRESH sweeps bounds
                    # the drift window.  Keyed on the GLOBAL sweep so a
                    # chunk-boundary-aligned resume replays bitwise.
                    def _do_refresh(args):
                        _logp, _cache = args
                        mks2 = [(kk == m).astype(jnp.float32)
                                for m in range(K)]
                        return density.full(mks2, th, tabs)

                    logp, cache = jax.lax.cond(
                        (t % _REFRESH) == (_REFRESH - 1),
                        _do_refresh, lambda a: a, (logp, cache))

                # ---- (c) pk adaptation + re-init (automix.c:1258-1281) --
                if in_adapt and K > 1:
                    tf = t.astype(jnp.float32)
                    gamma = jnp.exp((-2.0 / 3.0) * jnp.log(tf + 1.0))
                    newpk = []
                    for m in range(K):
                        if pooled_pk:
                            # shared pk from the global visit histogram
                            # (rjmcmc.py pooled branch): a scalar cross-
                            # lane fraction — valid because BLK == S, so
                            # this block IS the whole population
                            oh = jnp.sum((kk == m).astype(jnp.float32)) \
                                * np.float32(1.0 / BLK)
                        else:
                            oh = (kk == m).astype(jnp.float32)
                        newpk.append(pk[m] + gamma * (oh - pk[m]))
                    reinit = newpk[0] < pkl
                    for m in range(1, K):
                        reinit = reinit | (newpk[m] < pkl)
                    rf = reinit.astype(jnp.float32)
                    nri = nri + reinit.astype(jnp.int32)
                    pkl = jnp.where(reinit,
                                    1.0 / (10.0 * nri.astype(jnp.float32)),
                                    pkl)
                    pk = tuple(newpk[m] + rf * (1.0 / K - newpk[m])
                               for m in range(K))

                # ---- chunk statistics (rjmcmc._chunk_scan body) ---------
                mnew = [(kk == m) for m in range(K)]
                ks = tuple(ks[m] + mnew[m].astype(jnp.int32)
                           for m in range(K))
                ts = tuple(ts[m * D + d]
                           + mnew[m].astype(jnp.float32) * th[d]
                           for m in range(K) for d in range(D))
                tq = tuple(tq[m * D + d]
                           + mnew[m].astype(jnp.float32) * th[d] * th[d]
                           for m in range(K) for d in range(D))
                cnt = (cnt[0] + naccb, cnt[1] + ntryb, cnt[2] + naccs,
                       cnt[3] + ntrys, cnt[4] + acci, cnt[5] + 1)
                return (kk, logp, th, pk, pkl, nri, cache, ks, ts, tq, cnt)

            (kk, logp, th, pk, pkl, nri, _, ks, ts, tq,
             cnt) = jax.lax.fori_loop(
                0, n_sweeps, body,
                (kk0, lp0, th0, pk0, pkl0, nri0, cache0,
                 ks0, ts0, tq0, cnt0))

            k_o[:] = kk
            lp_o[:] = logp
            pkl_o[:] = pkl
            nri_o[:] = nri
            for d in range(D):
                th_o[d] = th[d]
            for m in range(K):
                pk_o[m] = pk[m]
                ks_o[m] = ks[m]
            for i in range(K * D):
                ts_o[i] = ts[i]
                tq_o[i] = tq[i]
            for c in range(6):
                cnt_o[c] = cnt[c]

        # ---- pallas_call plumbing --------------------------------------
        def vec_spec(rows):
            return pl.BlockSpec((rows, 8, W), lambda i, *_: (0, i, 0),
                                memory_space=pltpu.VMEM)

        flat_spec = pl.BlockSpec((8, W), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[flat_spec, vec_spec(D), flat_spec, vec_spec(K),
                      flat_spec, flat_spec,
                      smem_spec, smem_spec, smem_spec, smem_spec,
                      smem_spec, smem_spec, smem_spec]
            + [pl.BlockSpec(t.shape,
                            (lambda nd: lambda i, *_: (0,) * nd)(t.ndim),
                            memory_space=pltpu.VMEM)
               for t in tabs_np],
            out_specs=[flat_spec, vec_spec(D), flat_spec, vec_spec(K),
                       flat_spec, flat_spec,
                       vec_spec(K), vec_spec(K * D), vec_spec(K * D),
                       vec_spec(6)],
        )
        f32 = jnp.float32

        def out_sds(shape, dtype):
            return jax.ShapeDtypeStruct(shape, dtype)

        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                out_sds((G8, W), jnp.int32),      # k
                out_sds((D, G8, W), f32),         # theta
                out_sds((G8, W), f32),            # logp
                out_sds((K, G8, W), f32),         # pk
                out_sds((G8, W), f32),            # pkllim
                out_sds((G8, W), jnp.int32),      # nreinit
                out_sds((K, G8, W), jnp.int32),   # ksummary
                out_sds((K * D, G8, W), f32),     # theta_sum
                out_sds((K * D, G8, W), f32),     # theta_sqsum
                out_sds((6, G8, W), jnp.int32),   # counters
            ],
            interpret=interpret,
        )
        tabs_dev = tuple(jnp.asarray(t) for t in tabs_np)
        return call, BLK, W, G, G8, tabs_dev

    f32 = jnp.float32
    dims_f = jnp.asarray(modelset.dims, f32)

    def _prep_tables(prop: Proposal, L: int):
        """Per-chunk proposal tables: inverse factor, log-weights, and the
        allocation-logit base (shared by both runner modes)."""
        B = jnp.tril(prop.B.astype(f32))
        eye = jnp.broadcast_to(jnp.eye(D, dtype=f32), B.shape)
        binv = jax.lax.linalg.triangular_solve(
            B, eye, left_side=True, lower=True)
        lam = prop.lam.astype(f32)
        loglam = jnp.where(lam > 0, jnp.log(jnp.maximum(lam, 1e-38)),
                           jnp.asarray(NEG_INF, f32))
        logdet = prop.logdetB.astype(f32)
        abase = loglam - logdet - 0.5 * dims_f[:, None] * _LOG_2PI
        return (prop.sig.astype(f32), loglam, abase, logdet,
                prop.mu.astype(f32).reshape(K * L, D),
                binv.reshape(K * L, D * D),
                B.reshape(K * L, D * D))

    def _shard_index():
        if mesh is not None:
            from automix_tpu.parallel.mesh import CHAIN_AXIS
            return jax.lax.axis_index(CHAIN_AXIS).astype(jnp.int32)
        return jnp.int32(0)

    def _finish_chunk(chunk):
        if mesh is not None:
            from automix_tpu.parallel.mesh import CHAIN_AXIS
            chunk = jax.tree.map(
                lambda v: jax.lax.psum(v, CHAIN_AXIS), chunk)
        return chunk

    def _wrap(local_run):
        if mesh is None:
            return jax.jit(local_run)
        from jax.sharding import PartitionSpec as P

        from automix_tpu.parallel.mesh import CHAIN_AXIS
        chain_p = P(CHAIN_AXIS)
        rep_p = P()
        chains_spec = Chains(key=chain_p, k=chain_p, theta=chain_p,
                             logp=chain_p, pk=chain_p, pkllim=chain_p,
                             nreinit=chain_p, sweep=rep_p)
        prop_spec = jax.tree.map(lambda _: rep_p, Proposal(
            lam=0, mu=0, B=0, logdetB=0, nmix=0, sig=0))
        # check_vma=False: the kernel is opaque to the varying-axis
        # checker (and in interpret mode its inner fori_loop carries mix
        # tagged and untagged values); correctness of the manual psum
        # reduction is asserted by the sharded==unsharded test instead.
        return jax.jit(jax.shard_map(
            local_run, mesh=mesh,
            in_specs=(chains_spec, prop_spec),
            out_specs=(chains_spec, rep_p),
            check_vma=False))

    @functools.lru_cache(maxsize=None)
    def _compiled(n_sweeps: int, L: int, S: int):
        """Fully-fused runner: the whole chunk inside one kernel."""
        call, BLK, W, G, G8, tabs_dev = _built(n_sweeps, L, S, adapt)

        def local_run(chains: Chains, prop: Proposal):
            tabs = _prep_tables(prop, L)
            shard = _shard_index()
            scal = jnp.stack([jnp.int32(seed_static),
                              chains.sweep.astype(jnp.int32),
                              shard * G, shard * S])
            outs = call(
                scal,
                chains.k.reshape(G8, W),
                chains.theta.T.reshape(D, G8, W),
                chains.logp.reshape(G8, W),
                chains.pk.T.reshape(K, G8, W),
                chains.pkllim.reshape(G8, W),
                chains.nreinit.reshape(G8, W),
                *tabs, *tabs_dev,
            )
            (k2, th2, lp2, pk2, pkl2, nri2, ks2, ts2, tq2, cnt2) = outs
            chains_out = chains.replace(
                k=k2.reshape(S),
                theta=th2.reshape(D, S).T,
                logp=lp2.reshape(S),
                pk=pk2.reshape(K, S).T,
                pkllim=pkl2.reshape(S),
                nreinit=nri2.reshape(S),
                sweep=chains.sweep + n_sweeps,
            )
            cnt_tot = cnt2.sum(axis=(1, 2))
            chunk = {
                "ksummary": ks2.sum(axis=(1, 2)),
                "theta_sum": ts2.sum(axis=(1, 2)).reshape(K, D),
                "theta_sqsum": tq2.sum(axis=(1, 2)).reshape(K, D),
                "naccrwmb": cnt_tot[0], "ntryrwmb": cnt_tot[1],
                "naccrwms": cnt_tot[2], "ntryrwms": cnt_tot[3],
                "nacctd": cnt_tot[4], "ntrytd": cnt_tot[5],
            }
            return chains_out, _finish_chunk(chunk)

        return _wrap(local_run)

    @functools.lru_cache(maxsize=None)
    def _compiled_pooled(n_sweeps: int, L: int, S: int):
        """Semi-fused pooled-pk runner for multi-block / sharded runs.

        The reference adapts ONE shared pk vector from the global
        per-sweep visit histogram (automix.c:1258-1281).  When the chain
        population spans several lane blocks (or shards), no single
        kernel instance sees the whole histogram within a sweep, so the
        chunk becomes a ``lax.scan`` over sweeps: each step runs the
        one-sweep fused kernel (pk frozen in-kernel), reduces the [K]
        histogram across blocks — and shards, with one integer ``psum``
        (exact, layout-invariant) — and applies the Robbins-Monro update
        + re-init safeguard to the shared pk in XLA.  The state makes one
        HBM round-trip per sweep (measured: 1.50B chain-sweeps/s at 131k
        chains on v5e, 87% of the fully-fused mode), and the formulas
        match the in-kernel pooled branch bitwise — including the
        arithmetic-blend re-init — so a single-block run produces
        identical trajectories either way; verified bit-for-bit on v5e
        hardware across 500 production sweeps (Mosaic's in-kernel
        exp/log agree with XLA:TPU's)."""
        call, BLK, W, G, G8, tabs_dev = _built(1, L, S, False)
        n_shards = int(mesh.devices.size) if mesh is not None else 1
        inv_Sg = np.float32(1.0 / (S * n_shards))

        def local_run(chains: Chains, prop: Proposal):
            tabs = _prep_tables(prop, L)
            shard = _shard_index()
            if mesh is not None:
                from automix_tpu.parallel.mesh import CHAIN_AXIS

            def step(carry, t):
                (k, th, lp, pk_vec, pkl, nri,
                 ks_a, ts_a, tq_a, cnt_a) = carry
                scal = jnp.stack([jnp.int32(seed_static), t,
                                  shard * G, shard * S])
                outs = call(
                    scal, k, th, lp,
                    jnp.broadcast_to(pk_vec[:, None, None], (K, G8, W)),
                    jnp.broadcast_to(pkl, (G8, W)),
                    jnp.broadcast_to(nri, (G8, W)),
                    *tabs, *tabs_dev,
                )
                (k2, th2, lp2, _pk2, _pkl2, _nri2, ks2, ts2, tq2,
                 cnt2) = outs
                hist = ks2.sum(axis=(1, 2))           # [K] int32 local
                ks_a = ks_a + hist
                ts_a = ts_a + ts2.sum(axis=(1, 2))
                tq_a = tq_a + tq2.sum(axis=(1, 2))
                cnt_a = cnt_a + cnt2.sum(axis=(1, 2))
                if adapt and K > 1:
                    if mesh is not None:
                        hist = jax.lax.psum(hist, CHAIN_AXIS)
                    tf = t.astype(f32)
                    gamma = jnp.exp((-2.0 / 3.0) * jnp.log(tf + 1.0))
                    oh = hist.astype(f32) * inv_Sg
                    newpk = pk_vec + gamma * (oh - pk_vec)
                    reinit = jnp.any(newpk < pkl)
                    nri = nri + reinit.astype(jnp.int32)
                    pkl = jnp.where(reinit,
                                    1.0 / (10.0 * nri.astype(f32)), pkl)
                    # arithmetic blend, NOT a select: matches the
                    # in-kernel pooled branch bit for bit (fl(newpk +
                    # fl(1/K - newpk)) can differ from fl(1/K) by 1 ulp)
                    rf = reinit.astype(f32)
                    pk_vec = newpk + rf * (np.float32(1.0 / K) - newpk)
                return (k2, th2, lp2, pk_vec, pkl, nri,
                        ks_a, ts_a, tq_a, cnt_a), None

            sweep0 = chains.sweep.astype(jnp.int32)
            init = (chains.k.reshape(G8, W),
                    chains.theta.T.reshape(D, G8, W),
                    chains.logp.reshape(G8, W),
                    chains.pk[0].astype(f32),          # replicated rows
                    chains.pkllim[0].astype(f32),
                    chains.nreinit[0],
                    jnp.zeros((K,), jnp.int32),
                    jnp.zeros((K * D,), f32),
                    jnp.zeros((K * D,), f32),
                    jnp.zeros((6,), jnp.int32))
            carry, _ = jax.lax.scan(step, init,
                                    sweep0 + jnp.arange(n_sweeps,
                                                        dtype=jnp.int32))
            (k2, th2, lp2, pk_vec, pkl, nri,
             ks_a, ts_a, tq_a, cnt_a) = carry
            chains_out = chains.replace(
                k=k2.reshape(S),
                theta=th2.reshape(D, S).T,
                logp=lp2.reshape(S),
                pk=jnp.broadcast_to(pk_vec[None, :], (S, K)),
                pkllim=jnp.broadcast_to(pkl, (S,)),
                nreinit=jnp.broadcast_to(nri, (S,)),
                sweep=chains.sweep + n_sweeps,
            )
            chunk = {
                "ksummary": ks_a,
                "theta_sum": ts_a.reshape(K, D),
                "theta_sqsum": tq_a.reshape(K, D),
                "naccrwmb": cnt_a[0], "ntryrwmb": cnt_a[1],
                "naccrwms": cnt_a[2], "ntryrwms": cnt_a[3],
                "nacctd": cnt_a[4], "ntrytd": cnt_a[5],
            }
            return chains_out, _finish_chunk(chunk)

        return _wrap(local_run)

    def runner(chains: Chains, prop: Proposal, n_sweeps: int):
        L = int(prop.lam.shape[1])
        S = int(chains.k.shape[0])
        if mesh is not None:
            S = S // int(mesh.devices.size)
        # The semi-fused per-sweep scan is only needed when the shared pk
        # actually ADAPTS across a population no single kernel instance
        # sees; with adaptation off (burn-in, cfg.adapt=False) pk is
        # frozen and the fully-fused chunk kernel is valid at any block
        # count or mesh layout.
        if pooled_pk and adapt and (
                _FORCE_POOLED_SCAN or mesh is not None
                or choose_block(S, _est_tiles(modelset, L)) != S):
            return _compiled_pooled(n_sweeps, L, S)(chains, prop)
        return _compiled(n_sweeps, L, S)(chains, prop)

    return runner


# Test hook: force the semi-fused pooled runner even for single-block
# runs, so its bitwise equivalence with the in-kernel pooled branch can
# be asserted directly (tests/test_fused.py).
_FORCE_POOLED_SCAN = False
