"""GO-Sales NL→SQL evaluation set (round-4 verdict item 7; grown to 40
cases by round-5 verdict #8, 48 by round 7, 69 by round-8 verdict #8 —
every dialect rule now has >= 2 covering cases in different usage
shapes, enforced by tests/test_dialect_coverage.py): question →
golden-SQL cases over the
reference's own sample CSVs (/root/reference/sample_data, read-only),
spanning multi-table joins (the README "products sold in Italy"
shape), dd/MM/yyyy date filters, group-by/having, windowed top-N per
group, CTEs, set ops, correlated subqueries, LIMIT/OFFSET, string
functions, EVERY dialect-rewrite rule (GROUP_CONCAT, IIF, scalar
MIN/MAX, GLOB, printf, strftime, julianday, date('now'), total(),
unicode(), CAST AS TEXT/REAL, case-insensitive LIKE), and BOTH
deterministic bare-aggregate repairs (any_value and the single-MIN/MAX
max_by/min_by extremum form).  Every case runs
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

    # ---- round-6 growth (round-5 verdict #8): multi-table joins, date
    # filters, top-N per group, every dialect-rewrite rule, and both
    # deterministic bare-aggregate repairs, each with golden results.

    def c16_sql(h):
        # the README's "products sold in Italy" 3-table join shape
        return (
            f"SELECT DISTINCT p.Product AS product FROM `{h['s']}` s "
            f"JOIN `{h['r']}` r ON s.Retailer_code = r.Retailer_code "
            f"JOIN `{h['p']}` p ON s.Product_number = p.Product_number "
            f"WHERE r.Country = 'Italy'"
        )

    def c16_exp(frames):
        m = _merged(frames)
        return pd.DataFrame(
            {"product": sorted(m[m["Country"] == "Italy"]["Product"].unique())}
        )

    def c17_sql(h):
        # dd/MM/yyyy BETWEEN filter (July 2018)
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(Quantity) AS BIGINT) AS qty "
            f"FROM `{h['s']}` WHERE to_date(Date, 'dd/MM/yyyy') "
            f"BETWEEN DATE'2018-07-01' AND DATE'2018-07-31'"
        )

    def c17_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        f = frames["go_1k"][(d.dt.year == 2018) & (d.dt.month == 7)]
        return pd.DataFrame({"n": [len(f)], "qty": [int(f["Quantity"].sum())]})

    def c18_sql(h):
        # strftime('%Y-%m', ...) → date_format rewrite
        return (
            f"SELECT strftime('%Y-%m', to_date(Date, 'dd/MM/yyyy')) AS ym, "
            f"CAST(SUM(Quantity) AS BIGINT) AS qty FROM `{h['s']}` "
            f"WHERE strftime('%Y', to_date(Date, 'dd/MM/yyyy')) = '2017' GROUP BY ym"
        )

    def c18_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        f = frames["go_1k"][d.dt.year == 2017].assign(ym=d[d.dt.year == 2017].dt.strftime("%Y-%m"))
        out = f.groupby("ym", as_index=False)["Quantity"].sum()
        return out.rename(columns={"Quantity": "qty"})

    def c19_sql(h):
        # julianday difference → datediff rewrite (span of the data)
        return (
            f"SELECT CAST(julianday(MAX(to_date(Date, 'dd/MM/yyyy'))) "
            f"- julianday(MIN(to_date(Date, 'dd/MM/yyyy'))) AS BIGINT) AS span_days "
            f"FROM `{h['s']}`"
        )

    def c19_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        return pd.DataFrame({"span_days": [int((d.max() - d.min()).days)]})

    def c20_sql(h):
        # windowed top-N per group: top 2 products per line by quantity
        return (
            f"SELECT line, product, qty FROM ("
            f"SELECT p.Product_line AS line, p.Product AS product, "
            f"CAST(SUM(s.Quantity) AS BIGINT) AS qty, "
            f"ROW_NUMBER() OVER (PARTITION BY p.Product_line "
            f"ORDER BY SUM(s.Quantity) DESC, p.Product) AS rn "
            f"FROM `{h['s']}` s JOIN `{h['p']}` p "
            f"ON s.Product_number = p.Product_number "
            f"GROUP BY p.Product_line, p.Product) WHERE rn <= 2"
        )

    def c20_exp(frames):
        m = frames["go_1k"].merge(frames["go_products"], on="Product number")
        g = m.groupby(["Product line", "Product"], as_index=False)["Quantity"].sum()
        g = g.sort_values(
            ["Product line", "Quantity", "Product"], ascending=[True, False, True]
        )
        out = g.groupby("Product line").head(2)
        return out.rename(
            columns={"Product line": "line", "Product": "product", "Quantity": "qty"}
        )

    def c21_sql(h):
        # MISSING_GROUP_BY deterministic repair: bare column +
        # COUNT(*) → any_value() (constant under the filter)
        return (
            f"SELECT Product_line, CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` "
            f"WHERE Product_line = 'Golf Equipment'"
        )

    def c21_exp(frames):
        p = frames["go_products"]
        n = int((p["Product line"] == "Golf Equipment").sum())
        return pd.DataFrame({"Product_line": ["Golf Equipment"], "n": [n]})

    def c22_sql(h):
        # SQLite's single-MAX extremum guarantee → max_by repair
        return f"SELECT Product, MAX(Unit_price) AS top_price FROM `{h['p']}`"

    def c22_exp(frames):
        p = frames["go_products"]
        row = p.loc[p["Unit price"].idxmax()]
        return pd.DataFrame(
            {"Product": [row["Product"]], "top_price": [row["Unit price"]]}
        )

    def c23_sql(h):
        # MISSING_AGGREGATION (GROUP BY present): bare functionally-
        # dependent column → any_value repair
        return (
            f"SELECT Product_number, Product, CAST(SUM(Quantity) AS BIGINT) AS qty "
            f"FROM `{h['s']}` JOIN `{h['p']}` USING (Product_number) "
            f"GROUP BY Product_number ORDER BY qty DESC LIMIT 5"
        )

    def c23_exp(frames):
        m = frames["go_1k"].merge(frames["go_products"], on="Product number")
        g = m.groupby(["Product number", "Product"], as_index=False)["Quantity"].sum()
        g = g.sort_values(["Quantity", "Product number"], ascending=[False, True]).head(5)
        return g.rename(columns={"Product number": "Product_number", "Quantity": "qty"})

    def c24_sql(h):
        # single-MIN per group → min_by repair (cheapest product/line)
        return (
            f"SELECT Product_line, Product, MIN(Unit_price) AS price "
            f"FROM `{h['p']}` GROUP BY Product_line"
        )

    def c24_exp(frames):
        p = frames["go_products"]
        idx = p.groupby("Product line")["Unit price"].idxmin()
        out = p.loc[idx, ["Product line", "Product", "Unit price"]]
        return out.rename(
            columns={"Product line": "Product_line", "Unit price": "price"}
        )

    def c25_sql(h):
        # total() → coalesce(sum(), 0.0) over an empty subset
        return (
            f"SELECT total(Quantity) AS t FROM `{h['s']}` "
            f"WHERE Retailer_code = -1"
        )

    def c25_exp(frames):
        return pd.DataFrame({"t": [0.0]})

    def c26_sql(h):
        # date('now') rewrite: all sales predate today
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['s']}` "
            f"WHERE to_date(Date, 'dd/MM/yyyy') < date('now')"
        )

    def c26_exp(frames):
        return pd.DataFrame({"n": [len(frames["go_1k"])]})

    def c27_sql(h):
        # CAST AS TEXT / REAL rewrites
        return (
            f"SELECT CAST(Product_number AS TEXT) AS pn, "
            f"CAST(Unit_cost AS REAL) * 2 AS dbl_cost FROM `{h['p']}` "
            f"WHERE Product_number <= 2110"
        )

    def c27_exp(frames):
        p = frames["go_products"]
        f = p[p["Product number"] <= 2110]
        return pd.DataFrame(
            {
                "pn": f["Product number"].astype(str),
                "dbl_cost": f["Unit cost"] * 2.0,
            }
        )

    def c28_sql(h):
        # UNION (distinct) of two country filters
        return (
            f"SELECT Retailer_name AS name FROM `{h['r']}` WHERE Country = 'Italy' "
            f"UNION SELECT Retailer_name FROM `{h['r']}` WHERE Country = 'Spain'"
        )

    def c28_exp(frames):
        r = frames["go_retailers"]
        names = r[r["Country"].isin(["Italy", "Spain"])]["Retailer name"].unique()
        return pd.DataFrame({"name": sorted(names)})

    def c29_sql(h):
        # INTERSECT: countries selling both camping and golf lines
        return (
            f"SELECT DISTINCT r.Country AS country FROM `{h['s']}` s "
            f"JOIN `{h['r']}` r ON s.Retailer_code = r.Retailer_code "
            f"JOIN `{h['p']}` p ON s.Product_number = p.Product_number "
            f"WHERE p.Product_line = 'Camping Equipment' "
            f"INTERSECT "
            f"SELECT DISTINCT r.Country FROM `{h['s']}` s "
            f"JOIN `{h['r']}` r ON s.Retailer_code = r.Retailer_code "
            f"JOIN `{h['p']}` p ON s.Product_number = p.Product_number "
            f"WHERE p.Product_line = 'Golf Equipment'"
        )

    def c29_exp(frames):
        m = _merged(frames)
        camp = set(m[m["Product line"] == "Camping Equipment"]["Country"])
        golf = set(m[m["Product line"] == "Golf Equipment"]["Country"])
        return pd.DataFrame({"country": sorted(camp & golf)})

    def c30_sql(h):
        # LEFT JOIN ... IS NULL anti shape: retailers with no sales
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['r']}` r "
            f"LEFT JOIN (SELECT DISTINCT Retailer_code FROM `{h['s']}`) s "
            f"ON r.Retailer_code = s.Retailer_code "
            f"WHERE s.Retailer_code IS NULL"
        )

    def c30_exp(frames):
        sold = set(frames["go_1k"]["Retailer code"])
        n = int((~frames["go_retailers"]["Retailer code"].isin(sold)).sum())
        return pd.DataFrame({"n": [n]})

    def c31_sql(h):
        # derived table in FROM with alias
        return (
            f"SELECT AVG(t.qty) AS avg_qty FROM "
            f"(SELECT Retailer_code, SUM(Quantity) AS qty FROM `{h['s']}` "
            f"GROUP BY Retailer_code) t"
        )

    def c31_exp(frames):
        g = frames["go_1k"].groupby("Retailer code")["Quantity"].sum()
        return pd.DataFrame({"avg_qty": [float(g.mean())]})

    def c32_sql(h):
        # CASE WHEN bucketing
        return (
            f"SELECT CASE WHEN Unit_price < 10 THEN 'budget' "
            f"WHEN Unit_price < 100 THEN 'mid' ELSE 'premium' END AS tier, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` GROUP BY tier"
        )

    def c32_exp(frames):
        p = frames["go_products"]
        tier = pd.cut(
            p["Unit price"],
            bins=[-1e18, 10, 100, 1e18],
            right=False,
            labels=["budget", "mid", "premium"],
        ).astype(str)
        out = tier.value_counts().rename_axis("tier").reset_index(name="n")
        return out

    def c33_sql(h):
        # HAVING on an aggregate expression
        return (
            f"SELECT Product_line, ROUND(AVG(Unit_price), 2) AS avg_price "
            f"FROM `{h['p']}` GROUP BY Product_line HAVING AVG(Unit_price) > 50"
        )

    def c33_exp(frames):
        p = frames["go_products"]
        g = p.groupby("Product line", as_index=False)["Unit price"].mean()
        g = g[g["Unit price"] > 50]
        g["Unit price"] = g["Unit price"].round(2)
        return g.rename(
            columns={"Product line": "Product_line", "Unit price": "avg_price"}
        )

    def c34_sql(h):
        # ORDER BY expression + LIMIT/OFFSET pagination
        return (
            f"SELECT Product AS product FROM `{h['p']}` "
            f"ORDER BY Unit_price - Unit_cost DESC, Product LIMIT 5 OFFSET 5"
        )

    def c34_exp(frames):
        p = frames["go_products"].assign(margin=lambda x: x["Unit price"] - x["Unit cost"])
        p = p.sort_values(["margin", "Product"], ascending=[False, True])
        return pd.DataFrame({"product": p["Product"].iloc[5:10].tolist()})

    def c35_sql(h):
        # string functions: upper/substr/length (SQLite 1-based substr)
        return (
            f"SELECT UPPER(SUBSTR(Product, 1, 5)) AS head5, "
            f"CAST(LENGTH(Product) AS BIGINT) AS len FROM `{h['p']}` "
            f"WHERE Product = 'TrailChef Water Bag'"
        )

    def c35_exp(frames):
        return pd.DataFrame({"head5": ["TRAIL"], "len": [len("TrailChef Water Bag")]})

    def c36_sql(h):
        # replace + instr + unicode→ascii rewrites
        return (
            f"SELECT REPLACE(Product, ' ', '_') AS slug, "
            f"CAST(INSTR(Product, 'Water') AS BIGINT) AS pos, "
            f"CAST(unicode(Product) AS BIGINT) AS first_cp "
            f"FROM `{h['p']}` WHERE Product = 'TrailChef Water Bag'"
        )

    def c36_exp(frames):
        return pd.DataFrame(
            {"slug": ["TrailChef_Water_Bag"], "pos": [11], "first_cp": [ord("T")]}
        )

    def c37_sql(h):
        return (
            f"SELECT CAST(COUNT(DISTINCT Product_brand) AS BIGINT) AS brands, "
            f"CAST(COUNT(DISTINCT Product_color) AS BIGINT) AS colors FROM `{h['p']}`"
        )

    def c37_exp(frames):
        p = frames["go_products"]
        return pd.DataFrame(
            {
                "brands": [int(p["Product brand"].nunique())],
                "colors": [int(p["Product color"].nunique())],
            }
        )

    def c38_sql(h):
        # correlated EXISTS
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` p "
            f"WHERE EXISTS (SELECT 1 FROM `{h['s']}` s "
            f"WHERE s.Product_number = p.Product_number AND s.Quantity > 40)"
        )

    def c38_exp(frames):
        big = set(frames["go_1k"][frames["go_1k"]["Quantity"] > 40]["Product number"])
        n = int(frames["go_products"]["Product number"].isin(big).sum())
        return pd.DataFrame({"n": [n]})

    def c39_sql(h):
        # self-join: same-line same-color distinct product pairs
        return (
            f"SELECT a.Product_line AS line, CAST(COUNT(*) AS BIGINT) AS pairs "
            f"FROM `{h['p']}` a JOIN `{h['p']}` b "
            f"ON a.Product_line = b.Product_line "
            f"AND a.Product_color = b.Product_color "
            f"AND a.Product_number < b.Product_number "
            f"GROUP BY a.Product_line"
        )

    def c39_exp(frames):
        p = frames["go_products"]
        g = p.groupby(["Product line", "Product color"]).size()
        pairs = (g * (g - 1) // 2).groupby(level=0).sum()
        out = pairs[pairs > 0].rename_axis("line").reset_index(name="pairs")
        return out

    def c40_sql(h):
        # multi-CTE + window lag: month-over-month quantity delta, 2018
        return (
            f"WITH monthly AS ("
            f"SELECT month(to_date(Date, 'dd/MM/yyyy')) AS mth, "
            f"CAST(SUM(Quantity) AS BIGINT) AS qty FROM `{h['s']}` "
            f"WHERE year(to_date(Date, 'dd/MM/yyyy')) = 2018 GROUP BY mth), "
            f"with_prev AS ("
            f"SELECT mth, qty, LAG(qty) OVER (ORDER BY mth) AS prev FROM monthly) "
            f"SELECT mth, qty, qty - prev AS delta FROM with_prev"
        )

    def c40_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        f = frames["go_1k"][d.dt.year == 2018].assign(mth=d[d.dt.year == 2018].dt.month)
        g = f.groupby("mth", as_index=False)["Quantity"].sum().sort_values("mth")
        g["delta"] = g["Quantity"] - g["Quantity"].shift(1)
        return g.rename(columns={"Quantity": "qty"})

    def c41_sql(h):
        # CAST AS NUMERIC → DOUBLE widening (SQLite NUMERIC affinity
        # preserves the value; Spark decimal(10,0) would truncate)
        return (
            f"SELECT CAST(SUM(Quantity) AS NUMERIC) / 10 AS q FROM `{h['s']}`"
        )

    def c41_exp(frames):
        return pd.DataFrame({"q": [float(frames["go_1k"]["Quantity"].sum()) / 10]})

    def c42_sql(h):
        # GLOB '^' escape edge: '^' is a regex metachar — unescaped it
        # would anchor mid-pattern and match NOTHING here
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` "
            f"WHERE (Product || '^' || Product_brand) GLOB '*^*'"
        )

    def c42_exp(frames):
        return pd.DataFrame({"n": [len(frames["go_products"])]})

    def c43_sql(h):
        # GLOB '[^]]' edge: ']' FIRST in a negated class is a literal
        # member, not the class terminator
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` "
            f"WHERE Product GLOB '[^]]*'"
        )

    def c43_exp(frames):
        p = frames["go_products"]["Product"].astype(str)
        return pd.DataFrame({"n": [int((~p.str.startswith("]")).sum())]})

    def c44_sql(h):
        # SQLite json '->>' operator → get_json_object
        return (
            f"SELECT js ->> '$.q' AS q FROM "
            f"(SELECT concat('{{\"q\": ', Quantity, '}}') AS js FROM `{h['s']}`) t"
        )

    def c44_exp(frames):
        return pd.DataFrame({"q": frames["go_1k"]["Quantity"].astype(str)})

    def c45_sql(h):
        # SQLite/MySQL offset-first LIMIT 5, 3 → LIMIT 3 OFFSET 5
        return (
            f"SELECT Product FROM `{h['p']}` ORDER BY Product LIMIT 5, 3"
        )

    def c45_exp(frames):
        prods = frames["go_products"]["Product"].sort_values()
        return pd.DataFrame({"Product": prods.iloc[5:8].tolist()})

    def c46_sql(h):
        # date('now', '-1 day') modifier form → date_add arithmetic
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['s']}` "
            f"WHERE to_date(Date, 'dd/MM/yyyy') < date('now', '-1 day')"
        )

    def c46_exp(frames):
        return pd.DataFrame({"n": [len(frames["go_1k"])]})

    def c47_sql(h):
        # random() → rand(); never NULL on either engine
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['s']}` "
            f"WHERE random() IS NOT NULL"
        )

    def c47_exp(frames):
        return pd.DataFrame({"n": [len(frames["go_1k"])]})

    def c48_sql(h):
        # unixepoch() (SQLite >= 3.38) → unix_timestamp
        return (
            f"SELECT CAST(unixepoch(MIN(to_date(Date, 'dd/MM/yyyy'))) AS BIGINT) "
            f"AS t FROM `{h['s']}`"
        )

    def c48_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        return pd.DataFrame({"t": [int(d.min().timestamp())]})

    # ----- round-9 additions (c49-c69): every dialect rule gets a
    # SECOND covering case with a different usage shape (round-8
    # verdict #8) -----

    def c49_sql(h):
        # GROUP_CONCAT with an explicit separator (the 2-arg form —
        # c08 covers the default-',' form)
        return (
            f"SELECT Product_line AS line, "
            f"GROUP_CONCAT(Product_type, '|') AS types "
            f"FROM `{h['p']}` GROUP BY Product_line"
        )

    def c49_exp(frames):
        p = frames["go_products"]
        out = p.groupby("Product line", as_index=False)["Product type"].agg(
            lambda s: "|".join(s)
        )
        return out.rename(
            columns={"Product line": "line", "Product type": "types"}
        )

    def c50_sql(h):
        # NESTED IIF (c10 covers the flat form)
        return (
            f"SELECT IIF(Quantity > 50, 'big', "
            f"IIF(Quantity > 20, 'mid', 'small')) AS tier, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM `{h['s']}` GROUP BY tier"
        )

    def c50_exp(frames):
        q = frames["go_1k"]["Quantity"]
        tier = pd.Series(
            ["big" if v > 50 else ("mid" if v > 20 else "small") for v in q]
        )
        out = tier.value_counts().rename_axis("tier").reset_index(name="n")
        return out

    def c51_sql(h):
        # 3-arg scalar MIN + 2-arg scalar MAX in one expression (c10
        # covers the single 2-arg MAX)
        return (
            f"SELECT Product, "
            f"MIN(Unit_price, Unit_cost * 2, 10.0) AS floor_price, "
            f"MAX(Unit_cost, 5.0) AS cost_floor "
            f"FROM `{h['p']}` WHERE Product_line = 'Golf Equipment'"
        )

    def c51_exp(frames):
        p = frames["go_products"]
        g = p[p["Product line"] == "Golf Equipment"]
        return pd.DataFrame(
            {
                "Product": g["Product"].tolist(),
                "floor_price": [
                    min(a, b * 2, 10.0)
                    for a, b in zip(g["Unit price"], g["Unit cost"])
                ],
                "cost_floor": [max(c, 5.0) for c in g["Unit cost"]],
            }
        )

    def c52_sql(h):
        # strftime('%Y', ...) — the year form (c18 covers '%Y-%m')
        return (
            f"SELECT strftime('%Y', to_date(Date, 'dd/MM/yyyy')) AS yr, "
            f"CAST(SUM(Quantity) AS BIGINT) AS qty FROM `{h['s']}` GROUP BY yr"
        )

    def c52_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        f = frames["go_1k"].assign(yr=d.dt.year.astype(str))
        out = f.groupby("yr", as_index=False)["Quantity"].sum()
        return out.rename(columns={"Quantity": "qty"})

    def c53_sql(h):
        # julianday against a LITERAL date in a filter (c19 covers the
        # MAX-MIN span form)
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['s']}` "
            f"WHERE julianday(to_date(Date, 'dd/MM/yyyy')) "
            f"- julianday('2017-12-31') > 0"
        )

    def c53_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        return pd.DataFrame(
            {"n": [int((d > pd.Timestamp("2017-12-31")).sum())]}
        )

    def c54_sql(h):
        # datetime('now', '-1 year') modifier (c46 covers
        # date('now', '-1 day'))
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['s']}` "
            f"WHERE to_date(Date, 'dd/MM/yyyy') < datetime('now', '-1 year')"
        )

    def c54_exp(frames):
        return pd.DataFrame({"n": [len(frames["go_1k"])]})

    def c55_sql(h):
        # double-quoted STRING literal in a predicate (c09 covers the
        # GLOB-adjacent form)
        return (
            f'SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h["r"]}` '
            f'WHERE Country = "Italy"'
        )

    def c55_exp(frames):
        r = frames["go_retailers"]
        return pd.DataFrame({"n": [int((r["Country"] == "Italy").sum())]})

    def c56_sql(h):
        # random() inside abs() (c47 covers the IS NOT NULL form)
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['r']}` "
            f"WHERE abs(random()) >= 0"
        )

    def c56_exp(frames):
        return pd.DataFrame({"n": [len(frames["go_retailers"])]})

    def c57_sql(h):
        # CAST AS TEXT in a length() predicate (c27 covers the
        # projection form)
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['r']}` "
            f"WHERE length(CAST(Retailer_code AS TEXT)) = 4"
        )

    def c57_exp(frames):
        r = frames["go_retailers"]
        n = int((r["Retailer_code" if "Retailer_code" in r else "Retailer code"].astype(str).str.len() == 4).sum())
        return pd.DataFrame({"n": [n]})

    def c58_sql(h):
        # CAST AS REAL feeding an aggregate (c27 covers the projection)
        return (
            f"SELECT AVG(CAST(Quantity AS REAL)) AS avg_q FROM `{h['s']}`"
        )

    def c58_exp(frames):
        return pd.DataFrame(
            {"avg_q": [float(frames["go_1k"]["Quantity"].mean())]}
        )

    def c59_sql(h):
        # CAST AS NUMERIC on a fractional column (c41 covers the
        # integer-sum form)
        return (
            f"SELECT MAX(CAST(Unit_price AS NUMERIC)) AS top FROM `{h['p']}`"
        )

    def c59_exp(frames):
        return pd.DataFrame(
            {"top": [float(frames["go_products"]["Unit price"].max())]}
        )

    def c60_sql(h):
        # unicode() of a grouped column (c36 covers the
        # replace/instr-composed form)
        return (
            f"SELECT Country, unicode(Country) AS code FROM `{h['r']}` "
            f"GROUP BY Country"
        )

    def c60_exp(frames):
        r = frames["go_retailers"]
        out = pd.DataFrame({"Country": sorted(r["Country"].unique())})
        out["code"] = [ord(c[0]) for c in out["Country"]]
        return out

    def c61_sql(h):
        # single-arrow '->' extraction (c44 covers '->>')
        return (
            f"SELECT js -> '$.q' AS q FROM "
            f"(SELECT concat('{{\"q\": ', Quantity, '}}') AS js FROM `{h['s']}`) t"
        )

    def c61_exp(frames):
        return pd.DataFrame({"q": frames["go_1k"]["Quantity"].astype(str)})

    def c62_sql(h):
        # LIMIT off, cnt with a JOINed projection (c45 covers the
        # single-table form)
        return (
            f"SELECT Retailer_name FROM `{h['r']}` "
            f"ORDER BY Retailer_name LIMIT 2, 5"
        )

    def c62_exp(frames):
        names = frames["go_retailers"]["Retailer_name" if "Retailer_name" in frames["go_retailers"] else "Retailer name"].sort_values()
        return pd.DataFrame({"Retailer_name": names.iloc[2:7].tolist()})

    def c63_sql(h):
        # total() per GROUP (c25 covers the empty-subset scalar form)
        return (
            f"SELECT r.Type AS typ, total(s.Quantity) AS q "
            f"FROM `{h['s']}` s JOIN `{h['r']}` r "
            f"ON s.Retailer_code = r.Retailer_code GROUP BY r.Type"
        )

    def c63_exp(frames):
        m = frames["go_1k"].merge(frames["go_retailers"], on="Retailer code")
        out = m.groupby("Type", as_index=False)["Quantity"].sum()
        out["Quantity"] = out["Quantity"].astype(float)
        return out.rename(columns={"Type": "typ", "Quantity": "q"})

    def c64_sql(h):
        # unixepoch() span arithmetic (c48 covers the single-MIN form)
        return (
            f"SELECT CAST((unixepoch(MAX(to_date(Date, 'dd/MM/yyyy'))) "
            f"- unixepoch(MIN(to_date(Date, 'dd/MM/yyyy')))) / 86400 AS BIGINT) "
            f"AS span_days FROM `{h['s']}`"
        )

    def c64_exp(frames):
        d = pd.to_datetime(frames["go_1k"]["Date"], format="%d/%m/%Y")
        return pd.DataFrame({"span_days": [int((d.max() - d.min()).days)]})

    def c65_sql(h):
        # printf with zero-pad width (c11 covers '%d / %s' composition)
        return (
            f"SELECT printf('%05d', Retailer_code) AS padded "
            f"FROM `{h['r']}` ORDER BY Retailer_code LIMIT 3"
        )

    def c65_exp(frames):
        r = frames["go_retailers"]
        col = "Retailer_code" if "Retailer_code" in r else "Retailer code"
        codes = r[col].sort_values().head(3)
        return pd.DataFrame({"padded": [f"{c:05d}" for c in codes]})

    def c66_sql(h):
        # NOT LIKE, case-insensitive (c15 covers plain LIKE): SQLite
        # LIKE is case-insensitive, so 'trail%' must exclude TrailChef
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` "
            f"WHERE Product NOT LIKE 'trail%'"
        )

    def c66_exp(frames):
        p = frames["go_products"]["Product"].astype(str)
        return pd.DataFrame(
            {"n": [int((~p.str.lower().str.startswith("trail")).sum())]}
        )

    def c67_sql(h):
        # single-MAX extremum over a DIFFERENT table/column than c22
        return (
            f"SELECT Retailer_name, MAX(Retailer_code) AS top_code "
            f"FROM `{h['r']}`"
        )

    def c67_exp(frames):
        r = frames["go_retailers"]
        code = "Retailer_code" if "Retailer_code" in r else "Retailer code"
        name = "Retailer_name" if "Retailer_name" in r else "Retailer name"
        row = r.loc[r[code].idxmax()]
        return pd.DataFrame(
            {"Retailer_name": [row[name]], "top_code": [row[code]]}
        )

    def c68_sql(h):
        # single-MIN per group on a UNIQUE key (c24 covers the price
        # form): product numbers are unique, so min_by is deterministic
        return (
            f"SELECT Product_line, Product, MIN(Product_number) AS pn "
            f"FROM `{h['p']}` GROUP BY Product_line"
        )

    def c68_exp(frames):
        p = frames["go_products"]
        idx = p.groupby("Product line")["Product number"].idxmin()
        out = p.loc[idx, ["Product line", "Product", "Product number"]]
        return out.rename(
            columns={"Product line": "Product_line", "Product number": "pn"}
        )

    def c69_sql(h):
        # GLOB ']'-first negated class with a literal tail (c43 covers
        # the bare '[^]]*' prefix form)
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM `{h['p']}` "
            f"WHERE Product GLOB '[^]]*Bag'"
        )

    def c69_exp(frames):
        p = frames["go_products"]["Product"].astype(str)
        ok = (~p.str.startswith("]")) & p.str.endswith("Bag") & (p.str.len() >= 1)
        return pd.DataFrame({"n": [int(ok.sum())]})

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
        ("c16-italy-3table", "products sold in italy", c16_sql, c16_exp),
        ("c17-july-2018-between", "sales in july 2018", c17_sql, c17_exp),
        ("c18-strftime-month", "quantity by month of 2017", c18_sql, c18_exp),
        ("c19-julianday-span", "days between first and last sale", c19_sql, c19_exp),
        ("c20-top2-per-line", "top 2 products per line", c20_sql, c20_exp),
        ("c21-bare-count-repair", "golf line product count", c21_sql, c21_exp),
        ("c22-single-max-repair", "most expensive product", c22_sql, c22_exp),
        ("c23-missing-agg-repair", "top products by quantity", c23_sql, c23_exp),
        ("c24-min-by-line-repair", "cheapest product per line", c24_sql, c24_exp),
        ("c25-total-empty", "total quantity for missing retailer", c25_sql, c25_exp),
        ("c26-date-now", "sales before today", c26_sql, c26_exp),
        ("c27-cast-text-real", "product numbers as text", c27_sql, c27_exp),
        ("c28-union-countries", "italian or spanish retailers", c28_sql, c28_exp),
        ("c29-intersect-lines", "countries with camping and golf", c29_sql, c29_exp),
        ("c30-left-join-null", "retailers with no sales", c30_sql, c30_exp),
        ("c31-derived-table", "average retailer quantity", c31_sql, c31_exp),
        ("c32-case-tiers", "price tier counts", c32_sql, c32_exp),
        ("c33-having-avg", "lines with high average price", c33_sql, c33_exp),
        ("c34-limit-offset", "margin page two", c34_sql, c34_exp),
        ("c35-string-funcs", "water bag name head", c35_sql, c35_exp),
        ("c36-replace-instr", "water bag slug", c36_sql, c36_exp),
        ("c37-count-distinct", "brand and color counts", c37_sql, c37_exp),
        ("c38-exists-bulk", "products with a big order", c38_sql, c38_exp),
        ("c39-self-join-pairs", "same line color pairs", c39_sql, c39_exp),
        ("c40-cte-window-mom", "month over month delta 2018", c40_sql, c40_exp),
        ("c41-cast-numeric", "tenth of total quantity", c41_sql, c41_exp),
        ("c42-glob-caret", "products with caret marker", c42_sql, c42_exp),
        ("c43-glob-negated-rbracket", "products not bracketed", c43_sql, c43_exp),
        ("c44-json-arrow", "quantities from json", c44_sql, c44_exp),
        ("c45-limit-comma", "products page two short", c45_sql, c45_exp),
        ("c46-date-now-modifier", "sales before yesterday", c46_sql, c46_exp),
        ("c47-random-not-null", "row count via random", c47_sql, c47_exp),
        ("c48-unixepoch-first-sale", "first sale epoch", c48_sql, c48_exp),
        ("c49-group-concat-sep", "product types per line", c49_sql, c49_exp),
        ("c50-iif-nested", "quantity tier counts", c50_sql, c50_exp),
        ("c51-minmax-multiarg", "golf floor prices", c51_sql, c51_exp),
        ("c52-strftime-year", "quantity by year", c52_sql, c52_exp),
        ("c53-julianday-literal", "sales after 2017", c53_sql, c53_exp),
        ("c54-datetime-now-modifier", "sales before last year", c54_sql, c54_exp),
        ("c55-double-quoted-eq", "italian retailer count", c55_sql, c55_exp),
        ("c56-random-abs", "retailer count via random", c56_sql, c56_exp),
        ("c57-cast-text-length", "four digit retailer codes", c57_sql, c57_exp),
        ("c58-cast-real-avg", "average quantity real", c58_sql, c58_exp),
        ("c59-cast-numeric-max", "top unit price numeric", c59_sql, c59_exp),
        ("c60-unicode-grouped", "country first letter codes", c60_sql, c60_exp),
        ("c61-json-single-arrow", "quantities from json arrow", c61_sql, c61_exp),
        ("c62-limit-comma-names", "retailer names page", c62_sql, c62_exp),
        ("c63-total-per-group", "quantity by retailer type", c63_sql, c63_exp),
        ("c64-unixepoch-span", "sale span days epoch", c64_sql, c64_exp),
        ("c65-printf-zeropad", "padded retailer codes", c65_sql, c65_exp),
        ("c66-not-like-ci", "products not trail", c66_sql, c66_exp),
        ("c67-max-by-retailer", "retailer with top code", c67_sql, c67_exp),
        ("c68-min-by-number", "first product per line", c68_sql, c68_exp),
        ("c69-glob-negated-tail", "bags not bracketed", c69_sql, c69_exp),
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
    if cid == "c49-group-concat-sep":
        # same unspecified-order caveat, 2-arg separator form
        got = df.toPandas().sort_values("line").reset_index(drop=True)
        assert sorted(got.columns) == ["line", "types"]
        want2 = want.sort_values("line").reset_index(drop=True)
        assert got["line"].tolist() == want2["line"].tolist()
        for a, b in zip(got["types"], want2["types"]):
            assert sorted(a.split("|")) == sorted(b.split("|"))
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
