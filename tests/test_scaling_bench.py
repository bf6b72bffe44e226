"""The scaling harness (bench.py --config scaling) runs on the virtual CPU
mesh and its collective schedule stays flat as the mesh grows (VERDICT r3 #3
done-criterion; BASELINE.json north-star scaling artifact)."""

import sys

import pytest

import jax

sys.path.insert(0, "/root/repo")

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


@pytest.mark.timeout(900)
def test_scaling_harness_runs_and_collectives_stay_flat():
    import bench

    result = bench.bench_scaling(iters=3, repeats=1, device_counts=[1, 2, 4],
                                 hr=32, frames=4)
    points = result["points"]
    assert [p["devices"] for p in points] == [1, 2, 4]
    for p in points:
        assert p["frame_iters_per_s"] > 0
    # The contract: the per-evaluation collective schedule (psums inside the
    # CG while_loop body) does not grow with the mesh — N devices psum the
    # same scalar cost + one gradient image.
    ars = [p["all_reduce"] for p in points]
    cps = [p["collective_permute"] for p in points]
    assert len(set(ars)) == 1, ars
    assert len(set(cps)) == 1, cps
