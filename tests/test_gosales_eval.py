"""GO-Sales NL→SQL evaluation set (round-4 verdict item 7): ~15
question → golden-SQL cases over the reference's own sample CSVs
(/root/reference/sample_data, read-only), spanning joins, dd/MM/yyyy
dates, group-by/having, windows, CTEs, set ops, correlated subqueries,
and the SQLite-isms a real completion leans on (GROUP_CONCAT, IIF,
scalar MIN/MAX, GLOB, printf, case-insensitive LIKE).  Every case runs
through the PRODUCT surface — ``run_with_repair`` (prompt → FakeLLM
completion → fence extract → dialect rewrite → Catalyst) — and is
checked for result equality against a pandas ground truth computed
directly from the CSVs.  The module-level validity assertion is the
reference's actual product metric: generated SQL that executes on the
FIRST attempt (the dialect rewriter's job, reference README.md:42-46
behavior contract)."""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest

from pandasqlite_spark.core.ingest import ingest
from pandasqlite_spark.core.llm import FakeLLM, ReplayLLM
from pandasqlite_spark.core.text2sql import run_with_repair

SAMPLE_DIR = Path("/root/reference/sample_data")

pytestmark = pytest.mark.skipif(
    not SAMPLE_DIR.exists(), reason="reference sample_data not present"
)


@pytest.fixture(scope="module")
def gosales(spark, tmp_path_factory):
    import os

    os.environ["PANDASQLITE_SPARK_CACHE_DIR"] = str(
        tmp_path_factory.mktemp("gosales_eval_cache")
    )
    frames = {p.stem: pd.read_csv(p) for p in sorted(SAMPLE_DIR.glob("*.csv"))}
    results, _, _ = ingest(
        spark, list(frames.values()), FakeLLM(), persist=False
    )
    by_name = dict(zip(sorted(frames), results))
    h = {
        "s": by_name["go_1k"]["hash"],
        "p": by_name["go_products"]["hash"],
        "r": by_name["go_retailers"]["hash"],
        "m": by_name["go_methods"]["hash"],
    }
    return frames, h, results


def _merged(frames):
    return frames["go_1k"].merge(
        frames["go_products"], on="Product number"
    ).merge(frames["go_retailers"], on="Retailer code")


def _check(spark_df, want: pd.DataFrame):
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    want = want[got.columns.tolist()]
    cols = got.columns.tolist()
    got = got.sort_values(cols).reset_index(drop=True)
    want = want.sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-6, rtol=1e-9
    )


# each case: (id, question, golden_sql(h) -> str, expected(frames) -> DataFrame)
def _cases():
    def c01_sql(h):
        return (
            f"SELECT p.Product_line AS line, SUM(s.Quantity * p.Unit_price) AS revenue "
            f"FROM `{h['s']}` s JOIN `{h['p']}` p ON s.Product_number = p.Product_number "
            f"GROUP BY p.Product_line"
        )

    def c01_exp(frames):
        m = frames["go_1k"].merge(frames["go_products"], on="Product number")
        m = m.assign(revenue=m["Quantity"] * m["Unit price"])
        out = m.groupby("Product line", as_index=False)["revenue"].sum()
        return out.rename(columns={"Product line": "line"})

    def c02_sql(h):
        return (
            f"SELECT r.Country AS country, CAST(SUM(s.Quantity) AS BIGINT) AS qty "
            f"FROM `{h['s']}` s JOIN `{h['r']}` r ON s.Retailer_code = r.Retailer_code "
            f"GROUP BY r.Country ORDER BY qty DESC, country LIMIT 3"
        )

    def c02_exp(frames):
        m = frames["go_1k"].merge(frames["go_retailers"], on="Retailer code")
        out = m.groupby("Country", as_index=False)["Quantity"].sum()
        out = out.rename(columns={"Country": "country", "Quantity": "qty"})
        return out.sort_values(["qty", "country"], ascending=[False, True]).head(3)

    def c03_sql(h):
        # dd/MM/yyyy TEXT dates (FIXTURES.md §A)
        return (
            f"SELECT month(to_date(Date, 'dd/MM/yyyy')) AS mth, "
            f"CAST(SUM(Quantity) AS BIGINT) AS qty FROM `{h['s']}` "
            f"WHERE year(to_date(Date, 'dd/MM/yyyy')) = 2018 GROUP BY mth"
        )

    def c03_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        f = frames["go_1k"][d.dt.year == 2018].assign(mth=d[d.dt.year == 2018].dt.month)
        out = f.groupby("mth", as_index=False)["Quantity"].sum()
        return out.rename(columns={"Quantity": "qty"})

    def c04_sql(h):
        return (
            f"SELECT Product FROM `{h['p']}` WHERE Product_number NOT IN "
            f"(SELECT Product_number FROM `{h['s']}`)"
        )

    def c04_exp(frames):
        sold = set(frames["go_1k"]["Product number"])
        p = frames["go_products"]
        return p[~p["Product number"].isin(sold)][["Product"]]

    def c05_sql(h):
        return (
            f"SELECT Type AS rtype, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM `{h['r']}` GROUP BY Type HAVING COUNT(*) > 30"
        )

    def c05_exp(frames):
        out = frames["go_retailers"].groupby("Type", as_index=False).size()
        out = out.rename(columns={"Type": "rtype", "size": "n"})
        return out[out["n"] > 30]

    def c06_sql(h):
        return (
            f"SELECT line, best_product, qty FROM ("
            f"  SELECT p.Product_line AS line, p.Product AS best_product, "
            f"         CAST(SUM(s.Quantity) AS BIGINT) AS qty, "
            f"         ROW_NUMBER() OVER (PARTITION BY p.Product_line "
            f"           ORDER BY SUM(s.Quantity) DESC, p.Product) AS rn "
            f"  FROM `{h['s']}` s JOIN `{h['p']}` p "
            f"    ON s.Product_number = p.Product_number "
            f"  GROUP BY p.Product_line, p.Product) WHERE rn = 1"
        )

    def c06_exp(frames):
        m = frames["go_1k"].merge(frames["go_products"], on="Product number")
        g = m.groupby(["Product line", "Product"], as_index=False)["Quantity"].sum()
        g = g.sort_values(
            ["Product line", "Quantity", "Product"],
            ascending=[True, False, True],
        )
        out = g.groupby("Product line", as_index=False).first()
        return out.rename(
            columns={"Product line": "line", "Product": "best_product", "Quantity": "qty"}
        )

    def c07_sql(h):
        return (
            f"WITH per AS (SELECT Retailer_code, SUM(Quantity) AS q "
            f"FROM `{h['s']}` GROUP BY Retailer_code) "
            f"SELECT CAST(AVG(q) AS DOUBLE) AS avg_qty_per_retailer FROM per"
        )

    def c07_exp(frames):
        per = frames["go_1k"].groupby("Retailer code")["Quantity"].sum()
        return pd.DataFrame({"avg_qty_per_retailer": [float(per.mean())]})

    def c08_sql(h):
        # SQLite-ism: GROUP_CONCAT (order normalized by the checker)
        return (
            f"SELECT GROUP_CONCAT(Product_type) AS types FROM "
            f"(SELECT DISTINCT Product_type FROM `{h['p']}` "
            f" WHERE Product_line = 'Golf Equipment')"
        )

    def c08_exp(frames):
        p = frames["go_products"]
        types = sorted(p[p["Product line"] == "Golf Equipment"]["Product type"].unique())
        return pd.DataFrame({"types": [",".join(types)]})

    def c09_sql(h):
        # SQLite-ism: double-quoted GLOB pattern
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` "
            f'WHERE Product_line GLOB "Camp*"'
        )

    def c09_exp(frames):
        p = frames["go_products"]
        return pd.DataFrame(
            {"n": [int((p["Product line"].str.startswith("Camp")).sum())]}
        )

    def c10_sql(h):
        # SQLite-isms: IIF + scalar MAX
        return (
            f"SELECT Product, IIF(Unit_price > 100, 'premium', 'standard') AS tier, "
            f"MAX(Unit_price - Unit_cost, 0) AS margin FROM `{h['p']}` "
            f"WHERE Product_brand = 'TrailChef'"
        )

    def c10_exp(frames):
        p = frames["go_products"]
        p = p[p["Product brand"] == "TrailChef"]
        return pd.DataFrame(
            {
                "Product": p["Product"],
                "tier": (p["Unit price"] > 100).map(
                    {True: "premium", False: "standard"}
                ),
                "margin": (p["Unit price"] - p["Unit cost"]).clip(lower=0),
            }
        )

    def c11_sql(h):
        # SQLite-ism: printf
        return (
            f"SELECT printf('%s has %d retailers', Country, COUNT(*)) AS label "
            f"FROM `{h['r']}` GROUP BY Country HAVING COUNT(*) >= 50"
        )

    def c11_exp(frames):
        g = frames["go_retailers"].groupby("Country").size()
        g = g[g >= 50]
        return pd.DataFrame(
            {"label": [f"{c} has {n} retailers" for c, n in g.items()]}
        )

    def c12_sql(h):
        return (
            f"SELECT Country AS country FROM `{h['r']}` WHERE Type = 'Golf Shop' "
            f"EXCEPT "
            f"SELECT Country FROM `{h['r']}` WHERE Type = 'Department Store'"
        )

    def c12_exp(frames):
        r = frames["go_retailers"]
        golf = set(r[r["Type"] == "Golf Shop"]["Country"])
        dept = set(r[r["Type"] == "Department Store"]["Country"])
        return pd.DataFrame({"country": sorted(golf - dept)})

    def c13_sql(h):
        # correlated subquery
        return (
            f"SELECT Product FROM `{h['p']}` p1 WHERE Unit_price > "
            f"(SELECT AVG(Unit_price) FROM `{h['p']}` p2 "
            f" WHERE p2.Product_line = p1.Product_line)"
        )

    def c13_exp(frames):
        p = frames["go_products"]
        avg = p.groupby("Product line")["Unit price"].transform("mean")
        return p[p["Unit price"] > avg][["Product"]]

    def c14_sql(h):
        return (
            f"SELECT Product_color AS color, MIN(Unit_price) AS cheapest "
            f"FROM `{h['p']}` GROUP BY Product_color"
        )

    def c14_exp(frames):
        out = frames["go_products"].groupby("Product color", as_index=False)[
            "Unit price"
        ].min()
        return out.rename(columns={"Product color": "color", "Unit price": "cheapest"})

    def c15_sql(h):
        # SQLite LIKE is case-INSENSITIVE: 'camping%' must still match
        # 'Camping Equipment' (dialect ILIKE rewrite)
        return (
            f"SELECT CAST(COUNT(DISTINCT Product) AS BIGINT) AS n "
            f"FROM `{h['p']}` WHERE Product_line LIKE 'camping%'"
        )

    def c15_exp(frames):
        p = frames["go_products"]
        mask = p["Product line"].str.lower().str.startswith("camping")
        return pd.DataFrame({"n": [int(p[mask]["Product"].nunique())]})

    return [
        ("c01-join-revenue-by-line", "total revenue by product line", c01_sql, c01_exp),
        ("c02-top3-countries", "top 3 countries by quantity sold", c02_sql, c02_exp),
        ("c03-monthly-2018", "monthly quantity sold in 2018", c03_sql, c03_exp),
        ("c04-never-sold", "products that were never sold", c04_sql, c04_exp),
        ("c05-having-types", "retailer types with more than 30 stores", c05_sql, c05_exp),
        ("c06-window-best-per-line", "best selling product per line", c06_sql, c06_exp),
        ("c07-cte-avg-per-retailer", "average quantity per retailer", c07_sql, c07_exp),
        ("c08-group-concat", "list golf equipment types", c08_sql, c08_exp),
        ("c09-glob-camping", "how many camping products", c09_sql, c09_exp),
        ("c10-iif-scalar-max", "trailchef margins and tiers", c10_sql, c10_exp),
        ("c11-printf-label", "retailer counts by big country", c11_sql, c11_exp),
        ("c12-except-countries", "golf-only countries", c12_sql, c12_exp),
        ("c13-correlated-above-avg", "products above their line average price", c13_sql, c13_exp),
        ("c14-min-by-color", "cheapest price per color", c14_sql, c14_exp),
        ("c15-ilike-case", "count camping products lowercase", c15_sql, c15_exp),
    ]


_FIRST_TRY: dict[str, bool] = {}


@pytest.mark.parametrize(
    "cid,question,sql_fn,exp_fn",
    _cases(),
    ids=[c[0] for c in _cases()],
)
def test_gosales_eval_case(spark, gosales, cid, question, sql_fn, exp_fn):
    frames, h, results = gosales
    llm = FakeLLM(text2sql_answers={question: sql_fn(h)})
    df = run_with_repair(spark, question, results, llm)
    n_question_prompts = sum("[QUESTION]" in p or "```sql" in p for p in llm.calls)
    _FIRST_TRY[cid] = n_question_prompts == 1
    want = exp_fn(frames)
    if cid == "c08-group-concat":
        # GROUP_CONCAT order is unspecified in both engines — normalize
        got = df.toPandas()
        assert list(got.columns) == ["types"] and len(got) == 1
        assert sorted(got["types"][0].split(",")) == want["types"][0].split(",")
        return
    _check(df, want)


def test_gosales_eval_validity_rate(gosales):
    """Every golden completion must execute on the FIRST attempt — the
    dialect rewriter (not the repair loop) absorbs the SQLite-isms.
    Runs after the parametrized cases (pytest collection order)."""
    assert len(_FIRST_TRY) == len(_cases())
    failed = [k for k, ok in _FIRST_TRY.items() if not ok]
    assert not failed, f"cases needing repair turns: {failed}"


def test_gosales_repair_loop_recovers(spark, gosales):
    """A completion naming a nonexistent column must trigger ONE repair
    turn carrying the analyzer's error, and the second completion's
    result must be correct (the loop the reference lacks)."""
    frames, h, results = gosales
    good = (
        f"SELECT CAST(SUM(Quantity) AS BIGINT) AS total FROM `{h['s']}`"
    )
    llm = ReplayLLM(
        [
            f"```sql\nSELECT SUM(Quantidade) AS total FROM `{h['s']}`\n```",
            f"```sql\n{good}\n```",
        ]
    )
    df = run_with_repair(spark, "total quantity", results, llm)
    assert len(llm.prompts) == 2
    assert "[PREVIOUS ATTEMPT]" in llm.prompts[1]
    assert df.collect()[0]["total"] == int(frames["go_1k"]["Quantity"].sum())
