"""Independent DuckDB cross-check for ``q_markup_density``.

The query's driver-facing oracle is a golden parquet (the pages table
isn't one of the driver's registered views), so this test re-derives
every emitted column with DuckDB's own regexp/length kernels over the
SAME synthetic pages parquet and compares exactly — a second engine,
not a snapshot of the first.
"""

import glob

import duckdb
import pandas as pd

from textpipe_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


def test_markup_density_vs_duckdb(ray_session):
    got = (
        Q.q_markup_density(SF)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )

    pages = sorted(glob.glob(f"{Q.pages_dir_for(SF)}/pages-*.parquet"))
    con = duckdb.connect()
    sql = f"""
    WITH p AS (
      SELECT url, decode(html) AS html, text
      FROM read_parquet({pages!r})
    ),
    f AS (
      SELECT url,
        length(html) AS html_chars,
        length(html) - length(regexp_replace(html, '<[^>]*>', '', 'g')) AS tag_chars,
        len(string_split(html, '<a ')) - 1 AS n_links,
        len(string_split(html, '<p>')) - 1 AS n_paras,
        length(coalesce(text, '')) AS text_chars
      FROM p
    )
    SELECT url, html_chars, tag_chars, n_links, n_paras,
      (1000 * tag_chars) // greatest(html_chars, 1) AS markup_milli,
      (1000 * text_chars) // greatest(html_chars, 1) AS text_milli,
      (1000 * tag_chars) // greatest(html_chars, 1) >= {Q.MARKUP_HIGH_MILLI} AS high_markup,
      (1000 * text_chars) // greatest(html_chars, 1) < {Q.TEXT_LOW_MILLI} AS low_text
    FROM f ORDER BY url
    """
    want = con.execute(sql).fetchdf()
    con.close()

    assert len(got) == len(want) > 0
    for col in ["html_chars", "tag_chars", "n_links", "n_paras", "markup_milli", "text_milli"]:
        pd.testing.assert_series_equal(
            got[col].astype("int64"), want[col].astype("int64"), check_names=False, obj=col
        )
    for col in ["high_markup", "low_text"]:
        assert got[col].tolist() == want[col].tolist(), col
        # the docstring's claim: both flags live in both directions
        assert got[col].nunique() == 2, f"{col} is degenerate on the synthetic corpus"
