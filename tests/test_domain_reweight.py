"""q_domain_reweight: multiplicative-weights tilt direction and
normalization invariants."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_reweight_tilts_toward_above_average_domains(ray_session):
    from textpipe_ray.pipelines.queries import DOREMI_SCALE, q_domain_reweight

    df = q_domain_reweight(SF).to_pandas()
    assert len(df) == df["source"].nunique()
    # normalized weights sum to ~1e6 (floor division loses < n_domains)
    tot = int(df["weight_micro"].sum())
    assert DOREMI_SCALE - len(df) <= tot <= DOREMI_SCALE
    # monotone in the signal: the best-mean domain never gets less
    # weight than the worst-mean domain, and weights actually spread
    best = df.loc[df["mean_score_micro"].idxmax(), "weight_micro"]
    worst = df.loc[df["mean_score_micro"].idxmin(), "weight_micro"]
    assert best >= worst
    assert df["weight_micro"].nunique() > 1
    # rank order of weights follows rank order of means (clip keeps
    # the update monotone in the per-domain mean)
    by_mean = df.sort_values(["mean_score_micro", "source"])["weight_micro"].to_numpy()
    assert (np.diff(by_mean.astype(np.int64)) >= 0).all()
