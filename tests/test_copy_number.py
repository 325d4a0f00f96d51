"""FlowGraph min-cost-flow copy-number optimizer vs the reference's mock
graphs (copy_number_flow.rs:650-821 test cases, re-expressed)."""

import numpy as np

from jtk_tpu.graph.copy_number import FlowGraph


def _noisy(rng, cps, cov, sd=1.0, length=2):
    return [(float(rng.normal(cov * cp, sd)), length) for cp in cps]


def test_mock_1_diploid_bubbles():
    # 2-1-1-2-1-1-2 chain of two bubbles (mock_data_1)
    rng = np.random.default_rng(349823094)
    cov = 10.0
    nodes_cp = [2, 1, 1, 2, 1, 1, 2]
    nodes = _noisy(rng, nodes_cp, cov)
    edges = [
        (0, False, 1, True, cov),
        (0, False, 2, True, cov),
        (1, False, 3, True, cov),
        (2, False, 3, True, cov),
        (3, False, 4, True, cov),
        (3, False, 5, True, cov),
        (4, False, 6, True, cov),
        (5, False, 6, True, cov),
    ]
    g = FlowGraph(nodes, edges, cov)
    g.optimize()
    node_cp, edge_cp = g.copy_numbers()
    assert node_cp.tolist() == nodes_cp
    assert edge_cp.tolist() == [1] * len(edges)


def test_mock_2_triploid_cycle():
    # cyclic graph with copies up to 3 (mock_data_2)
    rng = np.random.default_rng(349823094)
    cov = 10.0
    nodes_cp = [3, 1, 3, 2, 1, 3]
    nodes = _noisy(rng, nodes_cp, cov, length=10)
    edges = [
        (0, False, 1, True, cov),
        (1, False, 2, True, cov),
        (0, False, 2, True, 2 * cov),
        (2, False, 3, True, 2 * cov),
        (3, False, 5, True, 2 * cov),
        (2, False, 4, True, cov),
        (4, False, 5, True, cov),
        (5, False, 0, True, 3 * cov),
    ]
    g = FlowGraph(nodes, edges, cov)
    g.optimize()
    node_cp, edge_cp = g.copy_numbers()
    assert node_cp.tolist() == nodes_cp
    assert edge_cp.tolist() == [1, 1, 2, 2, 2, 1, 1, 3]


def test_mock_3_inner_loop():
    # loop passing node 1 twice (mock_data_3)
    rng = np.random.default_rng(349823094)
    cov = 10.0
    nodes_cp = [2, 4, 2, 1, 1, 2, 2]
    nodes = _noisy(rng, nodes_cp, cov, length=10)
    edges = [
        (0, False, 1, True, 2 * cov),
        (1, False, 2, True, 2 * cov),
        (2, False, 3, True, cov),
        (3, False, 5, True, cov),
        (5, False, 1, False, 2 * cov),
        (2, False, 4, True, cov),
        (4, False, 5, True, cov),
        (6, False, 1, True, 2 * cov),
    ]
    g = FlowGraph(nodes, edges, cov)
    g.optimize()
    node_cp, edge_cp = g.copy_numbers()
    assert node_cp.tolist() == nodes_cp
    assert edge_cp.tolist() == [2, 2, 1, 1, 2, 1, 1, 2]


def test_mock_4_long_arms_decide():
    # noisy short bubble between two confident long arms (mock_data_4):
    # the length-weighted penalty must pin the arms at cp 2
    cov = 30.0
    nodes = [(26.0, 1), (30.0, 1000), (30.0, 1000), (23.0, 1)]
    edges = [
        (0, False, 1, True, 26.0),
        (0, False, 2, True, 20.0),
        (1, False, 3, True, 25.0),
        (2, False, 3, True, 10.0),
    ]
    g = FlowGraph(nodes, edges, cov)
    g.optimize()
    node_cp, edge_cp = g.copy_numbers()
    assert node_cp.tolist() == [2, 1, 1, 2]
    assert edge_cp.tolist() == [1, 1, 1, 1]


def test_mock_5_double_selfloop():
    # two self-loop repeats at cp 4 on a cp-2 backbone (mock_data_5)
    cov = 30.0
    nodes = [(60.0, 50), (120.0, 2), (60.0, 10), (120.0, 2), (60.0, 50)]
    edges = [
        (0, False, 1, True, 60.0),
        (1, False, 1, False, 60.0),
        (1, True, 2, True, 60.0),
        (2, False, 3, True, 60.0),
        (3, False, 3, False, 60.0),
        (3, True, 4, False, 60.0),
    ]
    g = FlowGraph(nodes, edges, cov)
    g.optimize()
    node_cp, edge_cp = g.copy_numbers()
    assert node_cp.tolist() == [2, 4, 2, 4, 2]
    assert edge_cp.tolist() == [2] * 6


def test_mock_6_selfloop_through_cycle():
    # cp-4 node revisited through a cp-2 cycle (mock_data_6)
    cov = 30.0
    nodes = [(60.0, 50), (120.0, 2), (60.0, 10), (60.0, 50)]
    edges = [
        (0, False, 1, True, 60.0),
        (1, False, 2, True, 60.0),
        (2, False, 1, False, 60.0),
        (1, True, 3, False, 60.0),
    ]
    g = FlowGraph(nodes, edges, cov)
    g.optimize()
    node_cp, edge_cp = g.copy_numbers()
    assert node_cp.tolist() == [2, 4, 2, 2]
    assert edge_cp.tolist() == [2] * 4


def test_penalty_decreases_and_zero_floor():
    rng = np.random.default_rng(7)
    cov = 12.0
    nodes = [(float(rng.normal(cov * c, 2)), 3) for c in (2, 0, 2)]
    edges = [(0, False, 1, True, 1.0), (1, False, 2, True, 1.0),
             (0, False, 2, True, 2 * cov)]
    g = FlowGraph(nodes, edges, cov)
    p0 = g.penalty()
    g.optimize()
    assert g.penalty() <= p0
    node_cp, edge_cp = g.copy_numbers()
    assert (node_cp >= 0).all() and (edge_cp >= 0).all()
    assert node_cp[1] == 0  # uncovered node stays at zero


def _mock1():
    cov = 10.0
    rng = np.random.default_rng(349823094)
    nodes_cp = [2, 1, 1, 2, 1, 1, 2]
    node_cov = [float(rng.normal(cov * cp, 1.0)) for cp in nodes_cp]
    edges = [
        (0, False, 1, True, cov), (0, False, 2, True, cov),
        (1, False, 3, True, cov), (2, False, 3, True, cov),
        (3, False, 4, True, cov), (3, False, 5, True, cov),
        (4, False, 6, True, cov), (5, False, 6, True, cov),
    ]
    return node_cov, edges, cov, nodes_cp


def test_gibbs_sampler_mock():
    from jtk_tpu.graph.copy_number_alt import estimate_copy_number_gbs
    node_cov, edges, cov, nodes_cp = _mock1()
    ncp, ecp = estimate_copy_number_gbs(node_cov, edges, cov,
                                        burn_in=300, sample_len=300)
    assert ncp.tolist() == nodes_cp
    assert ecp.tolist() == [1] * len(edges)


def test_mrf_mcmc_mock():
    from jtk_tpu.graph.copy_number_alt import estimate_copy_number_mcmc
    node_cov, edges, cov, nodes_cp = _mock1()
    nodes = [(c, 2) for c in node_cov]
    ncp, ecp = estimate_copy_number_mcmc(nodes, edges, cov, chains=2,
                                         burn_in=60)
    assert ncp.tolist() == nodes_cp, ncp
    assert ecp.tolist() == [1] * len(edges)


def test_mst_guided_mock():
    from jtk_tpu.graph.copy_number_alt import estimate_copy_number_mst
    node_cov, edges, cov, nodes_cp = _mock1()
    nodes = [(c, 2) for c in node_cov]
    ncp, ecp = estimate_copy_number_mst(nodes, edges, cov)
    assert ncp.tolist() == nodes_cp, ncp
    assert ecp.tolist() == [1] * len(edges)
