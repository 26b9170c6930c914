"""Normalizer parity: Python / pyarrow / DuckDB implementations agree."""

import duckdb
import pyarrow as pa

from the_yelp_collaborative_knowledge_graph_ray.functions.normalize import (
    normalize_array,
    normalize_one,
    normalize_sql,
)

CASES = [
    "Coffee & Tea", "  Health/Fitness  ", "Mo's Diner", "a--b", "UPPER CASE",
    "trail running", "weird..dots", "(parens)", "comma, sep", "", "x",
    "Tea&Coffee&More", "already_norm",
    # camelCase splitter (M16, reference string_functions.py:40-41)
    "WebSearch", "CodeInterpreter", "MachineLearning", "DataViz2Go",
    "ABCshop", "alreadyLower",
]


def test_three_way_parity():
    py = [normalize_one(s) for s in CASES]
    arrow = normalize_array(pa.array(CASES)).to_pylist()
    con = duckdb.connect()
    sql = [con.sql(f"SELECT {normalize_sql('?')}", params=[s]).fetchone()[0]
           for s in CASES]
    assert py == arrow == sql


def test_examples():
    assert normalize_one("Coffee & Tea") == "coffee_tea"
    assert normalize_one("Health/Fitness") == "health_fitness"
    assert normalize_one("COFFEE") == "coffee"
    assert normalize_one("coffees ") == "coffees"
    # camel split happens BEFORE lowercasing, so cased camel words and
    # spaced words canonicalize together (all-lowercase strings unchanged)
    assert normalize_one("WebSearch") == "web_search"
    assert normalize_one("MachineLearning") == "machine_learning"
    assert normalize_one("machine learning") == "machine_learning"
    assert normalize_one("machinelearning") == "machinelearning"


def test_singularizer_parity_and_rules():
    """ST2 stand-in: Python and Arrow singularizers agree; core rules hold.
    (Curated alias tables always win over these rules — see module doc.)"""
    from the_yelp_collaborative_knowledge_graph_ray.functions.singular import (
        singular_array,
        singular_one,
    )
    cases = ["bakeries", "wolves", "boxes", "churches", "classes", "coffees",
             "children", "people", "glass", "s", "tea", "quizzes", "dishes",
             "cats", "berries", "already_singular"]
    py = [singular_one(c) for c in cases]
    assert singular_array(pa.array(cases)).to_pylist() == py
    assert singular_one("bakeries") == "bakery"
    assert singular_one("coffees") == "coffee"
    assert singular_one("children") == "child"
    assert singular_one("glass") == "glass"  # not a plural
