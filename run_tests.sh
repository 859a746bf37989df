#!/bin/sh
# Bounded test gate (the repo's CI twin of the reference's
# .github/workflows/ci.yml:26-88).  Each pytest invocation stays well under
# a 10-minute budget; new modules must keep the FAST tier green and fast.
#
#   fast tier  (~4 min): every module, minus @pytest.mark.slow
#   slow tier  (~14 min total, split into bounded processes)
set -e
cd "$(dirname "$0")"
echo "== fast tier =="
timeout 540 python -m pytest tests/ -q -m "not slow"
if [ "$1" = "--fast" ]; then exit 0; fi
echo "== slow tier 1/4: pedersen + pedersen merkle =="
timeout 540 python -m pytest tests/test_pedersen.py tests/test_merkle_pedersen.py -q
echo "== slow tier 2/4: parallel + pallas =="
timeout 540 python -m pytest tests/test_parallel.py tests/test_poseidon_pallas.py -q
echo "== slow tier 3/4: curve rns =="
timeout 540 python -m pytest tests/test_curve_rns.py -q
echo "== slow tier 4/5: remaining slow marks =="
timeout 540 python -m pytest tests/ -q -m "slow" \
  --ignore=tests/test_pedersen.py --ignore=tests/test_parallel.py \
  --ignore=tests/test_poseidon_pallas.py --ignore=tests/test_curve_rns.py \
  --ignore=tests/test_merkle_pedersen.py --ignore=tests/test_sw_primitives.py
echo "== slow tier 5/5: short-weierstrass primitives =="
timeout 540 python -m pytest tests/test_sw_primitives.py -q -m "slow"
echo "ALL TIERS GREEN"
