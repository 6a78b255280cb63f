"""Aggregation witness: a REAL fibonacci shard proof's tower + class-main
verification stages expressed as bus-balanced, MockProver-satisfiable chip
witness sets (RECURSION.md build order #6, first slice)."""

import numpy as np
import pytest

from ceno_tpu.fields import babybear as bb
from ceno_tpu.emulator import programs
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.aggregate import build_aggregation_witness
from ceno_tpu.zkvm.e2e import run_e2e
from ceno_tpu.zkvm.tables import ZKVMConfig
from ceno_tpu.gkr.mock import MockProver

CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)


@pytest.fixture(scope="module")
def fib_result():
    vm = programs.fibonacci_vm(8)
    return run_e2e(vm, CFG, PARAMS)


def _pad(wit, k):
    n = max(2, 1 << max(0, (k - 1).bit_length()))
    if wit.shape[1] < n:
        wit = np.pad(wit, ((0, 0), (0, n - wit.shape[1])))
    return wit


def test_aggregation_witness_mock_satisfied(fib_result):
    res = fib_result
    sets, summary = build_aggregation_witness(res.pk.vk, res.proof)
    assert summary["tower_groups"] >= 1
    assert summary["classes"] >= 1
    assert summary["rows"] > 100
    mp_sets = []
    for name, compiled, cb, wit in sets:
        k = wit.shape[1]
        w = _pad(wit, k)
        mp_sets.append((compiled, cb, w,
                        np.zeros((0, w.shape[1]), np.uint64), np.zeros(0), k))
    assert MockProver.assert_satisfied(mp_sets) == []

    # tamper one witness cell in the largest set: something must break
    # (a local constraint or a bus chain)
    big = max(range(len(mp_sets)), key=lambda i: mp_sets[i][2].shape[1])
    bad = mp_sets[big][2].copy()
    bad[4, 1] = (int(bad[4, 1]) + 1) % bb.P
    tampered = list(mp_sets)
    tampered[big] = (mp_sets[big][0], mp_sets[big][1], bad,
                     mp_sets[big][3], mp_sets[big][4], mp_sets[big][5])
    errs = MockProver.assert_satisfied(tampered, raise_on_error=False)
    assert errs
