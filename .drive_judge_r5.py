import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np, random, time
print("backend:", jax.default_backend())

# ---- 1. pinned arkworks Poseidon vector (host + small-batch device) ----
from crypto_primitives_tpu.models.sponge import (
    Felt, PoseidonSponge, PoseidonSpongeBatch, get_default_poseidon_parameters)
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
cfg = get_default_poseidon_parameters(FR, 2, False)
s = PoseidonSponge(cfg); s.absorb([Felt(0), Felt(1), Felt(2)])
assert s.squeeze_native_field_elements(3)[0] == \
    40442793463571304028337753002242186710310163897048962278675457993207843616876
print("1. pinned arkworks Poseidon vector OK")

# ---- 2. big-plan fused Poseidon: 381-bit base field, RNS kernel vs host ----
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FQ as FQ
from crypto_primitives_tpu.models.sponge.poseidon import PoseidonConfig, find_poseidon_ark_and_mds
_ark, _mds = find_poseidon_ark_and_mds(FQ, 2, 8, 60, 0)
cfg48 = PoseidonConfig(field=FQ, full_rounds=8, partial_rounds=60, alpha=5,
                       ark=_ark, mds=_mds, rate=2, capacity=1)
rng = random.Random(7)
B = 128
sb = PoseidonSpongeBatch(cfg48, batch_shape=(B,), rep="rns")
vals = [rng.randrange(FQ.p) for _ in range(B)]
sb.absorb(jnp.asarray(FQ.pack(vals))[:, None, :])
out = sb.squeeze_native_field_elements(1)
got = [int(FQ.unpack(np.asarray(out)[b, 0])) for b in range(B)]
for b in (0, 63, 127):
    sh = PoseidonSponge(cfg48); sh.absorb_elements([vals[b]])
    assert got[b] == sh.squeeze_native_field_elements(1)[0], f"381-bit mismatch at {b}"
print("2. 381-bit big-plan RNS sponge == host oracle (rep=%s) OK" % sb.rep)

# ---- 3. G1 fused SW MSM kernel: Pedersen CRH on G1 vs python-int oracle ----
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH, Window
from crypto_primitives_tpu.ops.curves_known import BLS12_381_G1 as G1
w = Window(4, 64)
crh = PedersenCRH(G1, w)
params = crh.setup(rng)
msgs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(4)]
host = [crh.evaluate(params, m) for m in msgs]
marr = jnp.asarray(np.frombuffer(b"".join(msgs), np.uint8).reshape(4, 32))
dev = crh.evaluate_batch(params, marr)
from crypto_primitives_tpu.ops import curve_sw as _csw
aff = G1.base.unpack(np.asarray(dev))
got = [(int(aff[b][0]), int(aff[b][1])) for b in range(4)]
assert got == [tuple(h) for h in host], "G1 Pedersen batch != host"
print("3. G1 Pedersen CRH batch (fused SW RNS tier) == single-op host oracle OK")

# ---- 4. msm_many: one-dispatch multi-MSM surface ----
from crypto_primitives_tpu.models.crh.pedersen import PedersenCRH as PC
from crypto_primitives_tpu.ops.curves_known import JUBJUB
w2 = Window(4, 64)
crh_a, crh_b = PC(JUBJUB, w2), PC(JUBJUB, w2)
pa, pb = crh_a.setup(random.Random(1)), crh_b.setup(random.Random(2))
ma = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(8)]
mb = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(8)]
maarr = jnp.asarray(np.frombuffer(b"".join(ma), np.uint8).reshape(8, 32))
mbarr = jnp.asarray(np.frombuffer(b"".join(mb), np.uint8).reshape(8, 32))
outs = crh_a.evaluate_batch_rns_many([pa, pb], [maarr, mbarr])
from crypto_primitives_tpu.ops import curve_rns as _cr
for outr, crhx, px, ms in ((outs[0], crh_a, pa, ma), (outs[1], crh_b, pb, mb)):
    pts = np.asarray(_cr.unpack_affine_rns(JUBJUB, outr))
    exp = [crhx.evaluate(px, m) for m in ms]
    got = [(int(pts[i][0]), int(pts[i][1])) for i in range(len(ms))]
    assert got == [tuple(e) for e in exp], "msm_many mismatch"

print("4. msm_many / evaluate_batch_rns_many == per-op host oracle OK")

# ---- 5. native C++ 48-byte-field Poseidon three-way ----
import os
from crypto_primitives_tpu import native
print("   native available:", native.available())
from crypto_primitives_tpu.models.crh.poseidon import PoseidonTwoToOneCRH
two = PoseidonTwoToOneCRH(FQ)
l, r = rng.randrange(FQ.p), rng.randrange(FQ.p)
eng = native.poseidon_engine(cfg48)
assert eng is not None, "48-byte native poseidon engine missing"
two.compress(cfg48, l, r)  # warm
t0 = time.perf_counter(); d_native = two.compress(cfg48, l, r); t1 = time.perf_counter()
os.environ["CPT_NATIVE"] = "0"
d_py = two.compress(cfg48, l, r)
os.environ.pop("CPT_NATIVE")
assert d_native == d_py, "native 48B compress != python-int"
print("5. native 48-byte Poseidon compress == python-int (%.2f ms native) OK" % ((t1-t0)*1e3))

# ---- 6. IPA fold: device prover vs independent host verifier + forgery ----
from crypto_primitives_tpu.models.protocols.ipa_fold import (
    ipa_fold_prove_rns, ipa_fold_verify_host)
r3 = random.Random(3)
n = 8
gens = [JUBJUB.rand_point(r3) for _ in range(n)]
Bi = 2
p_s = JUBJUB.scalar.p
scal = [[r3.randrange(p_s) for _ in range(n)] for _ in range(Bi)]
proof = ipa_fold_prove_rns(JUBJUB, cfg, gens, scal)
for b in range(Bi):
    rounds_b = [(tuple(int(v) for v in proof["rounds"][j][0][b]),
                 tuple(int(v) for v in proof["rounds"][j][1][b]))
                for j in range(len(proof["rounds"]))]
    C_b, a_b = proof["commitment"][b], proof["a_star"][b]
    assert ipa_fold_verify_host(JUBJUB, cfg, gens, C_b, rounds_b, a_b)
    assert not ipa_fold_verify_host(JUBJUB, cfg, gens, C_b, rounds_b, (a_b + 1) % p_s)
print("6. IPA fold device prover accepted by independent host verifier; forgery rejected OK")
