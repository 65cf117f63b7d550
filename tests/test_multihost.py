"""DCN-tier video assignment: deterministic, cost-balanced, disjoint."""

import numpy as np

from vse_tpu.parallel.multihost import balanced_assignment, video_cost


def test_balanced_assignment_partitions_all():
    costs = [5.0, 1.0, 3.0, 3.0, 2.0, 8.0, 1.0]
    buckets = balanced_assignment(costs, 3)
    got = sorted(i for b in buckets for i in b)
    assert got == list(range(len(costs)))
    loads = [sum(costs[i] for i in b) for b in buckets]
    # LPT bound: max load <= (4/3) * optimal; optimal here is 23/3
    assert max(loads) <= 4 / 3 * (sum(costs) / 3) + max(costs) / 3


def test_assignment_deterministic_across_hosts():
    rng = np.random.default_rng(0)
    costs = list(rng.uniform(1, 100, size=37))
    a = balanced_assignment(costs, 4)
    b = balanced_assignment(list(costs), 4)
    assert a == b  # every host computes the same split without DCN traffic


def test_single_host_gets_everything():
    assert balanced_assignment([1.0, 2.0], 1) == [[0, 1]]
    assert video_cost(100, 1080, 1920) == 100 * 1080 * 1920
