"""semForms-analogue expression mining (`operators/expressions.py`).

Reference semantics: ``mine_code_for_expressions``
(`/root/reference/semForms/automl_eval/semforms.py:54-78`) — count
normalized expressions across a corpus, keep the 10 most frequent,
label them ``expr<idx>``.
"""

from graph4code_spark.operators.expressions import mine_expressions


def test_receiver_normalization_counts_across_variables(spark):
    # the semForms example frame (`semForms/example/test.json`): the same
    # transform written against differently-named receivers must count
    # as ONE expression
    rows = [
        ("houses_df['beds_to_total'] = houses_df['total_bedrooms'] / houses_df['total_rooms']",),
        ("h_df['beds_to_total'] = h_df['total_bedrooms'] / h_df['total_rooms']",),
        ("x['popdf'] = x['population'] / x['households']",),
    ]
    df = spark.createDataFrame(rows, "code string")
    out = {r["code"]: r["cnt"] for r in mine_expressions(df).collect()}
    assert out == {
        "df['beds_to_total'] = df['total_bedrooms'] / df['total_rooms']": 2,
        "df['popdf'] = df['population'] / df['households']": 1,
    }


def test_topk_labels_and_deterministic_ties(spark):
    rows = [(f"v{i}['c{i % 12}'] = v{i}['a'] / v{i}['b']",) for i in range(24)]
    df = spark.createDataFrame(rows, "code string")
    got = mine_expressions(df).collect()
    # 12 distinct normalized forms, each ×2 — top-10 cut is by code asc
    assert [r["expr_name"] for r in got] == [f"expr{i}" for i in range(10)]
    assert all(r["cnt"] == 2 for r in got)
    codes = [r["code"] for r in got]
    assert codes == sorted(codes)
    # the 2 lexicographically-last forms fell off the cap
    assert len(got) == 10
