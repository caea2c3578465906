"""Fake-image history pool (pix2pixHD ImagePool, --pool_size).

GAN stabilization from the reference's pix2pixHD lineage (SURVEY.md §2 #14;
the flag is accepted by every launcher though the shipped configs leave it
at 0): the discriminator trains on a mix of the current generator output and
a rolling history of past fakes, so D cannot overfit the latest G.

pix2pixHD keeps the pool as host-side Python state and stores the
CONCATENATED (label, fake) pair; here the pool is a device-resident ring
buffer inside the jitted train step — query/insert is pure array math
(gather + scatter + PRNG), so the whole G/D step stays one XLA program with
no host roundtrip.

Semantics matched to pix2pixHD's ImagePool.query per batch element:
  * pool not yet full -> insert the fake, train D on the fresh fake;
  * pool full -> with p=0.5 swap the fresh fake with a random pool entry
    and train D on the evicted one, else train D on the fresh fake.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pool_query(pool: jnp.ndarray, count: jnp.ndarray, key: jnp.ndarray,
               imgs: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pooled D-input query.

    pool:  (K, H, W, C) history buffer
    count: () int32 number of valid entries
    key:   PRNG key
    imgs:  (B, H, W, C) fresh detached fakes (with their label channels)

    Returns (d_inputs (B,H,W,C), new_pool, new_count, new_key).
    """
    B, K = imgs.shape[0], pool.shape[0]
    k_idx, k_coin, k_next = jax.random.split(key, 3)
    # sample history indices over the VALID entries only (count, not K):
    # on the batch that crosses the pool-full boundary a non-filling
    # element must not read a slot another element is writing this same
    # step (reads see the pre-update pool -> uninitialized zeros)
    valid = jnp.maximum(jnp.minimum(count, K), 1)
    uni_idx = jnp.floor(
        jax.random.uniform(k_idx, (B,)) * valid).astype(jnp.int32)
    if B <= K:
        # distinct indices (random permutation prefix) once the pool is
        # full: two swap lanes in one batch can then never collide on a
        # pool slot — pix2pixHD's sequential per-element query cannot
        # collide either, while a duplicate-index vectorized scatter would
        # drop one fresh fake nondeterministically and feed D the same
        # history image twice. The single boundary-crossing batch
        # (valid < K) keeps independent draws over the valid prefix.
        perm = jax.random.permutation(k_idx, K)[:B]
        rand_idx = jnp.where(valid >= K, perm, uni_idx)
    else:   # B > K: collisions unavoidable; independent draws
        rand_idx = uni_idx
    coin = jax.random.uniform(k_coin, (B,)) < 0.5

    slot = count + jnp.arange(B)             # would-be insert positions
    filling = slot < K                       # element goes into an empty slot
    # `count > 0` guards the B > K overflow lanes: on the very first batch
    # of an over-sized batch (count==0, slot>=K) `filling` is False but the
    # pool holds no initialized entries yet — playing back would feed D
    # all-zero images. Those lanes train on the fresh fake instead.
    use_hist = coin & ~filling & (count > 0)  # full pool + heads -> play back

    bcast = (slice(None), None, None, None)
    returned = jnp.where(use_hist[bcast], pool[rand_idx], imgs)

    # writes: filling inserts at `slot`; swaps write at `rand_idx`.
    # Non-writing lanes scatter to index K with mode='drop' so they can
    # never clobber a writing lane that shares their index.
    write_idx = jnp.where(filling, jnp.minimum(slot, K - 1), rand_idx)
    do_write = filling | use_hist
    write_idx = jnp.where(do_write, write_idx, K)
    pool = pool.at[write_idx].set(imgs, mode="drop")
    count = jnp.minimum(count + jnp.sum(filling.astype(count.dtype)), K)
    return returned, pool, count, k_next
