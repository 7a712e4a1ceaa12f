import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from bcalm_tpu.ops import chains as C

N = 600_000
M = 2 * N
succ = np.full(M, -1, np.int32)
succ[:N-1] = np.arange(1, N, dtype=np.int32)
succ[N+1:2*N] = np.arange(N, 2*N-1, dtype=np.int32)
valid = jnp.asarray(np.ones(M, bool))
pred = C.build_pred(jnp.asarray(succ), valid)

# eager replication of hier_jump's down loop with prints
idx = jnp.arange(M, dtype=jnp.int32)
has_pred = (pred >= 0) & valid
flg0 = jnp.where(has_pred, np.int32(0), np.int32(C._F_ROOTED | C._F_SETTLED))
Q = jnp.stack([jnp.where(has_pred, pred, idx), has_pred.astype(jnp.int32),
               jnp.where(valid, idx, M), jnp.zeros((M,), jnp.int32), flg0], axis=1)
gid = idx
lvl_valid = valid
sizes = [M]
while sizes[-1] // C._LEVEL_SHRINK >= C._FINAL_CAP:
    sizes.append(sizes[-1] // C._LEVEL_SHRINK)
print("sizes:", sizes)
for li in range(len(sizes) - 1):
    S, S1 = sizes[li], sizes[li + 1]
    local = jnp.arange(S, dtype=jnp.int32)
    fix = C._sampled(gid, 0x85EBCA6B * (li + 1)) & lvl_valid
    Q = C._phase(Q, fix, gid, C._R_A)
    settled = (Q[:, C._FLG] & C._F_SETTLED) != 0
    rooted = (Q[:, C._FLG] & C._F_ROOTED) != 0
    unres = lvl_valid & ~settled & ~rooted
    tmask = jnp.zeros((S,), bool).at[jnp.where(unres, Q[:, C._PTR], S)].set(True, mode="drop")
    cmask = (fix | tmask) & lvl_valid
    did = jnp.cumsum(cmask.astype(jnp.int32)) - 1
    n_c = int(jnp.sum(cmask.astype(jnp.int32)))
    print(f"level {li}: S={S} S1={S1} fix={int(fix.sum())} unres={int(unres.sum())} n_c={n_c} ok={n_c<=S1}")
    did = jnp.where(cmask, did, S1)
    rows = jnp.concatenate([Q, gid[:, None]], axis=1)
    base = jnp.concatenate([C._absorbing_filler(S1, M), jnp.full((S1, 1), M, jnp.int32)], axis=1)
    built = base.at[did].set(rows, mode="drop")
    Q1 = built[:, :C._COLS5]
    gid1 = built[:, C._COLS5]
    valid1 = jnp.arange(S1, dtype=jnp.int32) < n_c
    rooted1 = (Q1[:, C._FLG] & C._F_ROOTED) != 0
    ptr_new = jnp.take(did, jnp.where(rooted1, 0, Q1[:, C._PTR]), mode="clip")
    Q1 = Q1.at[:, C._PTR].set(jnp.where(rooted1, Q1[:, C._PTR], ptr_new))
    Q1 = Q1.at[:, C._FLG].set(Q1[:, C._FLG] & C._F_ROOTED)
    Q, gid, lvl_valid = Q1, gid1, valid1

print("gid1[:10]:", np.asarray(gid)[:10])
print("valid1 n:", int(lvl_valid.sum()))
s = C._sampled(gid, 0x85EBCA6B * 2)
print("sampled in first n_c:", int((s & lvl_valid).sum()))
h = (gid.astype(jnp.uint32) * np.uint32(2654435761) + np.uint32((0x85EBCA6B*2) & 0xFFFFFFFF)) >> np.uint32(13)
print("h[:8]:", np.asarray(h)[:8], "mod8:", np.asarray(h % np.uint32(8))[:8])
