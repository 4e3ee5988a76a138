"""Shared fixtures: one SparkSession per test session, one small universe."""

from __future__ import annotations

import shutil

import pytest

from mediacrawler_spark.fixtures import UniverseParams, build_universe
from mediacrawler_spark.schemas import (
    PAGES_SCHEMA,
    POLITENESS_SCHEMA,
    ROBOTS_SCHEMA,
    SEEDS_SCHEMA,
)
from mediacrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mediacrawler_spark_tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def universe():
    return build_universe(
        UniverseParams(
            n_notes=60,
            n_hosts=6,
            n_keywords=3,
            search_pages_per_keyword=2,
            max_comments_per_note=25,
        )
    )


@pytest.fixture(scope="session")
def udfs(spark, universe):
    return {
        "seeds": spark.createDataFrame(universe.seeds, SEEDS_SCHEMA),
        "pages": spark.createDataFrame(universe.pages, PAGES_SCHEMA),
        "robots": spark.createDataFrame(universe.robots, ROBOTS_SCHEMA),
        "politeness": spark.createDataFrame(universe.politeness, POLITENESS_SCHEMA),
    }


@pytest.fixture()
def tmp_catalog_dir(tmp_path):
    d = str(tmp_path / "snap")
    yield d
    shutil.rmtree(d, ignore_errors=True)
