"""Session-registered SQL functions — SURVEY.md §4's "registration of a
haversine SQL function (plain expression composition — session-registered
function, not a planner change)".

Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN <expr>) are pure expression
macros: they inline into the plan, stay inside whole-stage codegen, and
never touch a Python worker (verified in tests — no BatchEvalPython in
the plan). This gives the SQL surface the same vocabulary the DataFrame
surface gets from operators.relational (band3, haversine_km) and
operators.dedup (norm_text, cosine similarity), keeping the two entry
points in lockstep (reference pattern:
work/Projet_Spark_Analyse_Climatique.ipynb:199-200 registers views, then
works in SQL).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name -> CREATE statement. All bodies are pure SQL expressions
#: (codegen-friendly); the DataFrame twins live in operators/.
SQL_FUNCTIONS: dict[str, str] = {
    # great-circle distance (reference UDF work/Projet/preparation_noaa.ipynb:485-506,
    # rebuilt as a native expression)
    "haversine_km": """
        CREATE OR REPLACE TEMPORARY FUNCTION haversine_km(
            lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
        RETURNS DOUBLE
        RETURN 6371.0 * 2 * asin(sqrt(
            pow(sin(radians(lat2 - lat1) / 2), 2)
            + cos(radians(lat1)) * cos(radians(lat2))
              * pow(sin(radians(lon2 - lon1) / 2), 2)))
    """,
    # 3-level alert banding (reference work/spark_processor.py:31-38)
    "band3": """
        CREATE OR REPLACE TEMPORARY FUNCTION band3(
            v DOUBLE, t1 DOUBLE, t2 DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN v < t1 THEN 'level_0'
                    WHEN v <= t2 THEN 'level_1'
                    ELSE 'level_2' END
    """,
    # canonical text form every dedup family hashes (operators.dedup.norm_text)
    "norm_text": """
        CREATE OR REPLACE TEMPORARY FUNCTION norm_text(s STRING)
        RETURNS STRING
        RETURN lower(trim(regexp_replace(s, '\\\\s+', ' ')))
    """,
    # cosine similarity over array<double> via higher-order functions —
    # same lambda algebra as operators.dedup.cosine_sim
    "cosine_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
               / (sqrt(aggregate(a, 0.0D, (acc, v) -> acc + v * v))
                  * sqrt(aggregate(b, 0.0D, (acc, v) -> acc + v * v)))
    """,
}


def register_all(spark: SparkSession) -> None:
    """Install every engine SQL function into the session catalog."""
    for stmt in SQL_FUNCTIONS.values():
        spark.sql(stmt)
