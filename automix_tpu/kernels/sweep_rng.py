"""Pallas TPU kernel for the stage-3 per-sweep random draws.

The sweep kernel consumes [S, MU] uniforms and [S, MZ] standard normals per
sweep (kernels/rjmcmc.py rand_slots).  The default path derives them from
per-chain threefry keys — counter-based, sharding-invariant, but ~1/3 of
total sweep time on TPU (threefry is ~100 VPU ops per 32-bit word; measured
57us of a 169us tutorial sweep at 32768 chains).

This kernel replaces threefry with the TPU core's hardware PRNG
(``pltpu.prng_random_bits``), which emits random words at near-memory
speed.  Uniforms take the top 24 bits of each word; normals are Box-Muller
pairs.  Streams are deterministic and resumable: the PRNG is seeded per
(seed, sweep, global chain-block), so a draw depends only on the engine
seed, the global sweep counter, and the chain's global block index — the
same contract as the threefry path.

Sharding: under ``shard_map`` each shard generates only its local block
rows, seeded by *global* block indices (the caller passes the shard's block
offset), so trajectories are independent of the mesh layout as long as the
block size divides every shard.  On non-TPU backends a threefry fallback
with the same stream structure substitutes for the hardware PRNG (tests);
the engine only auto-selects this path on real TPU (config.rng == "auto").

No counterpart exists in the reference: its RNG is the sequential
global-state SuperDuper generator (automix.c:1290-1316).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586
_INV_2_24 = float(2.0 ** -24)
_INV_2_25 = float(2.0 ** -25)

# Chains per grid block. Fixed so the (seed, sweep, block) -> bits mapping
# is a pure function of the chain's global index, independent of sharding.
CHAIN_BLOCK = 1024


def choose_block(s_local: int) -> int:
    """Largest power-of-two block <= CHAIN_BLOCK dividing the local chain
    count (chain counts are powers of two in practice)."""
    cb = CHAIN_BLOCK
    while cb > 1 and s_local % cb != 0:
        cb //= 2
    return cb


def _uniform01(bits):
    """Random words -> float32 uniforms strictly inside (0, 1): top 24 bits
    plus the half-ulp offset, matching the fast counter-hash path's
    contract (ops/randoms.py _bits_to_uniform) — u == 0 would force
    unconditional MH acceptance and an extreme Gumbel value.

    The logical-shifted top 24 bits fit in an int32, which Mosaic can cast
    to float32 (uint32 -> float32 casts are unsupported)."""
    top24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    return top24.astype(jnp.float32) * _INV_2_24 + _INV_2_25


def _kernel(scal_ref, u_ref, z_ref, *, mu: int, n_pairs: int, mz: int,
            wpad: int):
    # scal_ref: [3] int32 = (seed, sweep, block0). Every (seed, sweep,
    # global block) gets an independent hardware-PRNG stream.  Mosaic
    # accepts at most two seed words, so the global block index is mixed
    # into the first word by an odd-constant multiply (bijective in the
    # block index, so distinct blocks cannot collide within a run).
    block = scal_ref[2] + pl.program_id(0)
    pltpu.prng_seed(scal_ref[0] + block * jnp.int32(-1640531527),
                    scal_ref[1])
    # One lane-aligned generation per block; slices feed the outputs.
    cb = u_ref.shape[0]
    words = _uniform01(pltpu.prng_random_bits((cb, wpad)))
    u_ref[:] = words[:, :mu]
    u1 = words[:, mu:mu + n_pairs]
    u2 = words[:, mu + n_pairs:mu + 2 * n_pairs]
    # Box-Muller (reference uses the polar variant, automix.c:1639-1661):
    # u1 < 1 - 2^-24 strictly, so log1p(-u1) is finite.
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    ang = _TWO_PI * u2
    z = jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=1)
    z_ref[:] = z[:, :mz]


def _fallback_draw(scalars, n_chains: int, mu_count: int, mz_count: int):
    """Non-TPU implementation of :func:`draw` with the same (seed, sweep,
    global block) stream structure, built on threefry.  Used for CPU tests
    and forced-pallas runs off-TPU; NOT bitwise-equal to the TPU kernel
    (the Mosaic interpreter does not emulate the hardware PRNG — it
    returns zeros — so a real generator is substituted instead)."""
    cb = choose_block(n_chains)
    nblocks = n_chains // cb
    base = jax.random.fold_in(jax.random.PRNGKey(scalars[0]), scalars[1])

    def blk(i):
        kb = jax.random.fold_in(base, scalars[2] + i)
        u = jax.random.uniform(jax.random.fold_in(kb, 0),
                               (cb, mu_count), jnp.float32)
        z = jax.random.normal(jax.random.fold_in(kb, 1),
                              (cb, mz_count), jnp.float32)
        return u, z

    u, z = jax.vmap(blk)(jnp.arange(nblocks))
    return (u.reshape(n_chains, mu_count), z.reshape(n_chains, mz_count))


def draw(scalars, n_chains: int, mu_count: int, mz_count: int,
         interpret: bool = False):
    """Per-sweep uniforms [S, MU] and normals [S, MZ] from the TPU PRNG.

    ``scalars``: int32 [3] = (seed, sweep, block0) where block0 is the
    first global block index of this shard (0 when unsharded).
    ``interpret`` selects the non-TPU fallback (see ``_fallback_draw``).
    """
    if interpret:
        return _fallback_draw(scalars, n_chains, mu_count, mz_count)
    cb = choose_block(n_chains)
    n_pairs = (mz_count + 1) // 2
    wpad = -(-(mu_count + 2 * n_pairs) // 128) * 128
    kernel = functools.partial(_kernel, mu=mu_count, n_pairs=n_pairs,
                               mz=mz_count, wpad=wpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chains // cb,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((cb, mu_count), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, mz_count), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    u, z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chains, mu_count), jnp.float32),
            jax.ShapeDtypeStruct((n_chains, mz_count), jnp.float32),
        ],
    )(scalars)
    return u, z


def resolve_rng(cfg) -> str:
    """Resolve cfg.rng ("auto" | "threefry" | "fast" | "pallas") to a
    concrete mode.

    "auto" picks the fused counter-hash generator (ops/randoms.py
    fast_sweep_randoms) for Gaussian runs — it fuses into the sweep with no
    kernel-launch barrier and is bitwise sharding-invariant on every
    backend.  The Student-t mode needs gamma variates and stays on the
    threefry path.  "pallas" (this module's hardware-PRNG kernel) is kept
    as an explicit opt-in: measured end-to-end it LOSES to the fused hash
    (1059us vs 147us per tutorial sweep at 32768 chains) because a
    per-sweep pallas_call inside lax.scan pays a kernel-launch + fusion
    barrier every iteration."""
    mode = getattr(cfg, "rng", "auto")
    if mode != "auto":
        return mode
    if cfg.student_t_dof == 0 and cfg.dtype == jnp.float32:
        return "fast"
    return "threefry"
