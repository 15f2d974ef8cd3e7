"""Elo solver tests — the reference's Monte-Carlo validation style
(SURVEY.md §4.7: ELBO terms vs 100k-sample MC estimates, synthetic
tournaments, improvement property tests)."""
import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from boardlaw_tpu import elos
from boardlaw_tpu import activelo
from boardlaw_tpu.activelo import solvers, suggestions


def _trials(rows):
    return pd.DataFrame(rows, columns=["black_agent", "white_agent", "black_wins", "white_wins"])


def test_symmetrize():
    trials = _trials([["a", "b", 3, 1], ["b", "a", 2, 2]])
    ws, gs = elos.symmetrize(trials)
    assert gs.loc["a", "b"] == 8
    # a won 3 as black + 2 as white = 5 of 8
    np.testing.assert_allclose(ws.loc["a", "b"] + ws.loc["b", "a"], 8)
    np.testing.assert_allclose(ws.loc["a", "b"], 5.0)


def test_elo_solve_ordering():
    rng = np.random.default_rng(0)
    true = {"a": 2.0, "b": 0.0, "c": -2.0}
    names = list(true)
    rows = []
    for i in names:
        for j in names:
            if i == j:
                continue
            p = 1 / (1 + np.exp(-(true[i] - true[j])))
            wins = rng.binomial(400, p)
            rows.append([i, j, wins, 400 - wins])
    ws, gs = elos.symmetrize(_trials(rows))
    r = elos.solve(ws, gs)
    assert r["a"] > r["b"] > r["c"]
    assert r["a"] == 0  # anchored to best
    np.testing.assert_allclose(r["b"] - r["c"], 2.0, atol=0.3)

    errs = elos.elo_errors(r, _trials(rows))
    assert (errs < 0.05).all()


def test_quadrature_matches_monte_carlo():
    rng = np.random.default_rng(1)
    for mu, s2 in [(0.0, 1.0), (2.0, 4.0), (-3.0, 0.25)]:
        d = rng.normal(mu, np.sqrt(s2), 200_000)
        expected = (-np.log1p(np.exp(-d))).mean()
        actual = float(solvers.expected_log_sigmoid(jnp.array([mu]), jnp.array([s2]))[0])
        np.testing.assert_allclose(actual, expected, rtol=0.02, atol=0.02)


def test_elbo_terms_monte_carlo():
    # entropy + prior of a hand-set Gaussian vs sampling (reference
    # solvers.py:152-180)
    rng = np.random.default_rng(2)
    mu = np.array([1.0, 2.0])
    Sigma = np.array([[1.0, 0.5], [0.5, 2.0]])
    s = rng.multivariate_normal(mu, Sigma, 100_000)

    # entropy
    from scipy.stats import multivariate_normal

    expected_entropy = -multivariate_normal(mu, Sigma).logpdf(s).mean()
    L = np.linalg.cholesky(Sigma)
    logdet = 2 * np.log(np.diagonal(L)).sum()
    actual_entropy = 0.5 * (2 * np.log(2 * np.pi * np.e) + logdet)
    np.testing.assert_allclose(actual_entropy, expected_entropy, rtol=0.01)

    # prior
    prior = multivariate_normal(
        np.zeros(2), solvers.SIGMA_0 ** 2 * np.eye(2)
    )
    expected_prior = prior.logpdf(s).mean()
    actual_prior = (
        -0.5 * np.log(2 * np.pi)
        - np.log(solvers.SIGMA_0)
        - 1 / (2 * solvers.SIGMA_0 ** 2) * (mu ** 2 + np.diagonal(Sigma))
    ).sum()
    np.testing.assert_allclose(actual_prior, expected_prior, rtol=0.02, atol=0.02)


def test_activelo_recovers_ratings():
    rng = np.random.default_rng(3)
    true = np.array([1.5, 0.0, -1.5])
    N = 3
    n = np.zeros((N, N))
    w = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            p = 1 / (1 + np.exp(-(true[i] - true[j])))
            n[i, j] = 200
            w[i, j] = rng.binomial(200, p)
    soln = activelo.solve(n, w)
    assert soln.mu[0] > soln.mu[1] > soln.mu[2]
    np.testing.assert_allclose(soln.mu[0] - soln.mu[2], 3.0, atol=0.5)
    # posterior stds should be small with this much data
    assert np.all(soln.sigmad[~np.eye(N, dtype=bool)] < 0.5)


def test_activelo_pandas_and_warmstart():
    idx = ["p", "q"]
    n = pd.DataFrame([[0, 50], [50, 0]], idx, idx)
    w = pd.DataFrame([[0, 40], [10, 0]], idx, idx)
    soln = activelo.solve(n, w)
    assert soln.mu["p"] > soln.mu["q"]
    # warm start from the previous solution
    soln2 = activelo.solve(n, w, soln=solvers.Solution(
        n=n.values, w=w.values, mu=soln.mu.values,
        Sigma=soln.Sigma.values, mud=None, sigmad=None))
    np.testing.assert_allclose(soln2.mu.values, soln.mu.values, atol=0.05)


def test_improvement_properties():
    # reference suggestions.py:33-47
    mk = lambda mud, sigmad: solvers.Solution(None, None, None, None, np.array(mud), np.array(sigmad))
    assert suggestions.improvement(mk(0.0, 1.0)) < suggestions.improvement(mk(0.0, 2.0))
    assert suggestions.improvement(mk(0.0, 1.0)) > suggestions.improvement(mk(1.0, 1.0))
    assert suggestions.improvement(mk(-1.0, 1.0)) == suggestions.improvement(mk(1.0, 1.0))


def test_suggest():
    idx = ["a", "b", "c"]
    mud = pd.DataFrame(np.zeros((3, 3)), idx, idx)
    sigmad = pd.DataFrame(np.eye(3) * 0 + [[0.1, 2.0, 0.1]] * 3, idx, idx)
    soln = solvers.Solution(None, None, None, None, mud, sigmad)
    row, col = activelo.suggest(soln)
    assert col == "b"


# -- examples: synthetic tournaments + active matchmaking -------------------

def test_examples_generated_recovers_truth():
    from boardlaw_tpu.activelo import examples

    truth, soln = examples.generated_example(n_agents=8, games_scale=80, seed=3)
    mu = np.asarray(soln.mu)
    # centered ratings should correlate strongly with the planted truth
    t = truth - truth.mean()
    m = mu - mu.mean()
    corr = (t * m).sum() / np.sqrt((t**2).sum() * (m**2).sum())
    assert corr > 0.9


def test_examples_active_matchmaking_converges():
    from boardlaw_tpu.activelo import examples

    truth, trace = examples.simulate_log_ranks(
        n_agents=6, n_games=128, sigresid_tol=0.25, max_rounds=40, seed=1
    )
    assert trace[-1]["sigresid"] < 0.25
    # uncertainty must shrink as games accumulate
    assert trace[-1]["sigresid"] < trace[0]["sigresid"]
    # and the final ranks track the planted ladder
    assert trace[-1]["resid_var"] < 0.2


def test_examples_warmstart_stable():
    from boardlaw_tpu.activelo import examples

    sigmas = examples.reuse_example(n_agents=6, seed=0, repeats=4)
    assert np.all(np.isfinite(sigmas))
    # warm-started re-solves of the same data shouldn't drift
    assert np.ptp(sigmas) < 0.05 * sigmas.mean() + 1e-3
