"""CART decision-tree training and LDA estimation tests.

Invariants (reference semantics, Cart/DecisionTreeTrainer.cc +
Speech/DecisionTreeTrainer.cc + Signal/ScatterEstimator.cc):
  * Gaussian LL gain matches the closed form for hand-built stats;
  * greedy training finds the planted partition, honors min-obs /
    min-gain / max-leaves, and numbers leaves in commit order;
  * written XML round-trips through sprint.cart.DecisionTree.read;
  * scatter finalize satisfies Between + Within == Total, sharded
    accumulation+merge equals single-pass;
  * the generalized eigen solve reproduces the analytic 2-class LDA
    direction and is W-orthonormal.
"""

import math

import numpy as np
import pytest

from speechrecognition_tpu.sprint.cart import DecisionTree, Question
from speechrecognition_tpu.sprint.cart_train import (CartTrainer, ExampleSet,
                                                     Step, TrainingPlan,
                                                     _pooled_neg_ll,
                                                     write_tree_xml)
from speechrecognition_tpu.sprint.lda import (ScatterMatricesEstimator,
                                              estimate_lda,
                                              estimate_sliding_window_lda,
                                              solve_generalized_eigen)


# ---------------------------------------------------------------- CART


def _make_examples(rng, centers, props, n_per=200, dim=3, spread=0.05):
    feats, labels = [], []
    for i, c in enumerate(centers):
        x = rng.normal(c, spread, (n_per, dim))
        feats.append(x)
        labels.append(np.full(n_per, i))
    return ExampleSet.accumulate(np.concatenate(feats),
                                 np.concatenate(labels), props)


def test_pooled_neg_ll_closed_form():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 1.5, (1000, 4))
    n = np.asarray(float(len(x)))
    ll = float(_pooled_neg_ll(n, x.sum(0), (x * x).sum(0), 1e-10))
    var = x.var(axis=0)
    expect = 0.5 * len(x) * (4 + 4 * math.log(2 * math.pi)
                             + np.log(var).sum())
    assert abs(ll - expect) < 1e-6 * abs(expect)


def test_trainer_finds_planted_split():
    rng = np.random.default_rng(1)
    props = [{"central": p, "hmm-state": "0"} for p in "a e i o".split()]
    # vowels a,e share a center; i,o share another → best split {a,e}
    ex = _make_examples(rng, [(0, 0, 0), (0, 0, 0), (5, 5, 5), (5, 5, 5)],
                        props)
    questions = [Question("central", frozenset(s.split()))
                 for s in ("a", "e", "a e", "a i", "a o")]
    plan = TrainingPlan([Step("s", "split", questions, min_obs=1)],
                        max_leaves=2)
    tree, leaves = CartTrainer(plan, ex).train()
    assert len(leaves) == 2
    split = CartTrainer(plan, ex)
    split_tree, _ = split.train()
    assert split.splits[0].question.values == frozenset({"a", "e"})
    # classification: a,e → one leaf; i,o → the other
    ids = [tree.classify({"central": p}) for p in "a e i o".split()]
    assert ids[0] == ids[1] and ids[2] == ids[3] and ids[0] != ids[2]


def test_trainer_honors_limits():
    rng = np.random.default_rng(2)
    props = [{"central": p} for p in "a b c d".split()]
    ex = _make_examples(rng, [(0, 0, 0), (2, 2, 2), (4, 4, 4), (6, 6, 6)],
                        props)
    qs = [Question("central", frozenset([p])) for p in "a b c d".split()]
    # max-leaves=3 stops after 2 splits
    plan = TrainingPlan([Step("s", "split", qs, min_obs=1)], max_leaves=3)
    _tree, leaves = CartTrainer(plan, ex).train()
    assert len(leaves) == 3
    # min-obs larger than any side blocks all splits
    plan = TrainingPlan([Step("s", "split", qs, min_obs=10_000)])
    _tree, leaves = CartTrainer(plan, ex).train()
    assert len(leaves) == 1
    # huge min-gain blocks all splits
    plan = TrainingPlan([Step("s", "split", qs, min_gain=1e12)])
    _tree, leaves = CartTrainer(plan, ex).train()
    assert len(leaves) == 1


def test_cluster_action_peels_silence_first():
    """Reference plans isolate silence with a 'cluster' step before the
    main 'split' step — the YES-child becomes a final leaf."""
    rng = np.random.default_rng(3)
    props = [{"central": "si"}, {"central": "a"}, {"central": "b"}]
    ex = _make_examples(rng, [(9, 9, 9), (0, 0, 0), (1, 1, 1)], props)
    plan = TrainingPlan([
        Step("sil", "cluster", [Question("central", frozenset(["si"]))],
             min_obs=1),
        Step("main", "split",
             [Question("central", frozenset([p])) for p in "a b".split()],
             min_obs=1),
    ])
    tree, leaves = CartTrainer(plan, ex).train()
    assert len(leaves) == 3
    # silence leaf committed first → class id 0 after commit-order numbering
    assert tree.classify({"central": "si"}) == 0
    assert tree.classify({"central": "a"}) != tree.classify({"central": "b"})


def test_tree_xml_round_trip(tmp_path):
    rng = np.random.default_rng(4)
    phones = "a b c d e f".split()
    props = [{"central": p, "hmm-state": str(s)}
             for p in phones for s in range(2)]
    centers = rng.normal(0, 3, (len(props), 3))
    ex = _make_examples(rng, centers, props, n_per=50)
    qs = ([Question("central", frozenset([p])) for p in phones]
          + [Question("central", frozenset(["a", "b", "c"]))]
          + [Question("hmm-state", frozenset(["0"]))])
    plan = TrainingPlan([Step("s", "split", qs, min_obs=1)], max_leaves=7)
    tree, _ = CartTrainer(plan, ex).train()

    path = str(tmp_path / "trained.tree")
    write_tree_xml(tree, path)
    back = DecisionTree.read(path)
    for p in props:
        assert back.classify(p) == tree.classify(p)


def test_question_used_once_per_path():
    """A committed question is removed from the children's candidate
    list (commitSplit swap-and-pop) — with a single question, at most
    one split along any root-to-leaf path."""
    rng = np.random.default_rng(5)
    props = [{"central": p} for p in "a b c".split()]
    ex = _make_examples(rng, [(0, 0, 0), (4, 4, 4), (8, 8, 8)], props)
    q = [Question("central", frozenset(["a"]))]
    plan = TrainingPlan([Step("s", "split", q, min_obs=1)])
    tree, leaves = CartTrainer(plan, ex).train()
    assert len(leaves) == 2  # one split only, question consumed


def test_plan_xml_parse(tmp_path):
    xml = """<decision-tree-training>
      <max-leaves>100</max-leaves>
      <step name="silence" action="cluster">
        <min-obs>500</min-obs><min-gain>0</min-gain>
        <questions><question><key>central</key><value>si</value></question></questions>
      </step>
      <step name="main" action="split">
        <min-obs>1000</min-obs><min-gain>50</min-gain>
        <questions>
          <question description="vowel"><key>central</key><values>a e i</values></question>
        </questions>
      </step>
    </decision-tree-training>"""
    p = tmp_path / "plan.xml"
    p.write_text(xml)
    plan = TrainingPlan.read_xml(str(p))
    assert plan.max_leaves == 100
    assert [s.action for s in plan.steps] == ["cluster", "split"]
    assert plan.steps[1].min_obs == 1000 and plan.steps[1].min_gain == 50
    assert plan.steps[1].questions[0].values == frozenset("a e i".split())


# ---------------------------------------------------------------- LDA


def test_scatter_identity_and_merge():
    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (500, 4)) + rng.integers(0, 3, 500)[:, None]
    c = rng.integers(0, 3, 500)
    est = ScatterMatricesEstimator(3, 4)
    est.accumulate(x, c)
    b, w, t = est.finalize()
    np.testing.assert_allclose(b + w, t, rtol=1e-12, atol=1e-12)

    e1 = ScatterMatricesEstimator(3, 4)
    e2 = ScatterMatricesEstimator(3, 4)
    e1.accumulate(x[:250], c[:250])
    e2.accumulate(x[250:], c[250:])
    e1.merge(e2)
    b2, w2, t2 = e1.finalize()
    np.testing.assert_allclose(b2, b, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(w2, w, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(t2, t, rtol=1e-10, atol=1e-12)


def test_generalized_eigen_two_class_direction():
    """For 2 classes, the top LDA direction is parallel to
    W^-1 (mu1 - mu0) (Fisher)."""
    rng = np.random.default_rng(7)
    cov = np.array([[2.0, 0.7, 0.1], [0.7, 1.0, 0.2], [0.1, 0.2, 0.5]])
    L = np.linalg.cholesky(cov)
    mu = [np.zeros(3), np.array([1.0, -2.0, 0.5])]
    xs, cs = [], []
    for k in range(2):
        xs.append(rng.normal(0, 1, (20000, 3)) @ L.T + mu[k])
        cs.append(np.full(20000, k))
    est = ScatterMatricesEstimator(2, 3)
    est.accumulate(np.concatenate(xs), np.concatenate(cs))
    between, within, _ = est.finalize()
    vals, vecs = solve_generalized_eigen(between, within)
    assert vals[0] > 1.0 and abs(vals[1]) < 0.05 and abs(vals[2]) < 0.05
    fisher = np.linalg.solve(within, mu[1] - mu[0])
    cos = abs(fisher @ vecs[:, 0]) / (np.linalg.norm(fisher)
                                      * np.linalg.norm(vecs[:, 0]))
    assert cos > 0.99
    # W-orthonormality: v^T W v = I
    g = vecs.T @ within @ vecs
    np.testing.assert_allclose(g, np.eye(3), atol=1e-8)


def test_estimate_lda_reduction():
    rng = np.random.default_rng(8)
    x = np.concatenate([rng.normal(k, 0.3, (2000, 5)) for k in range(4)])
    c = np.repeat(np.arange(4), 2000)
    est = ScatterMatricesEstimator(4, 5)
    est.accumulate(x, c)
    b, w, _ = est.finalize()
    vals, transform = estimate_lda(b, w, reduced_dim=2)
    assert transform.shape == (2, 5)
    assert vals[0] >= vals[1] >= vals[2]
    # threshold-based reduction (reduced-dimesion-threshold semantics)
    vals2, tr2 = estimate_lda(b, w, eigenvalue_threshold=float(vals[1]) / 2)
    assert tr2.shape[0] >= 1


def test_sliding_window_lda_end_to_end():
    """Windowed LDA estimation produces a projector under which the
    planted classes are linearly separated."""
    rng = np.random.default_rng(9)
    segs, labs = [], []
    for _ in range(30):
        T = 50
        cls = (np.arange(T) // 25).astype(np.int64)   # halves: class 0 / 1
        base = np.where(cls[:, None] == 0, -1.0, 1.0)
        segs.append(base + rng.normal(0, 0.4, (T, 4)))
        labs.append(cls)
    lda = estimate_sliding_window_lda(segs, labs, num_classes=2,
                                      max_size=3, right=1, reduced_dim=2,
                                      regularize=1e-8)
    proj = lda(segs[0].astype(np.float32))
    assert proj.shape == (50, 2)
    m0, m1 = proj[:25, 0].mean(), proj[25:, 0].mean()
    s = max(proj[:25, 0].std(), proj[25:, 0].std())
    assert abs(m0 - m1) > 3.0 * s
