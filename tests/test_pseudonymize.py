"""q_pseudonymize: stable keyed pseudonyms — the property that makes it
more than scrubbing (same entity → same token in every document)."""

import hashlib

SF = "/root/testdata/sf0.001"


def test_pseudonym_stability_and_coverage(ray_session):
    from textpipe_ray.pipelines.queries import PSEUDO_MOD, q_pseudonymize

    df = q_pseudonymize(SF).to_pandas()
    admin_tok = "<EMAIL_" + hashlib.md5(b"admin@example.com").hexdigest()[:8] + ">"
    planted = df[df["doc_id"] % PSEUDO_MOD == 0]
    assert len(planted) > 0
    # the repeated global entity resolves to the SAME pseudonym everywhere
    assert planted["scrubbed"].str.contains(admin_tok, regex=False).all()
    # raw identifiers never survive the rewrite
    assert not df["scrubbed"].str.contains("@example.com", regex=False).any()
    assert (planted["n_pii"] == 2).all()
    assert (planted["n_distinct"] == 2).all()
    clean = df[df["doc_id"] % PSEUDO_MOD != 0]
    assert (clean["n_pii"] == 0).all()
