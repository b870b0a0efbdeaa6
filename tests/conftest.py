from __future__ import annotations

import os

import pytest

from app_insights_generator_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def ckpt_root(tmp_path_factory) -> str:
    """ONE reliable-checkpoint root shared by every checkpoint_dir-using
    test (VERDICT r09 item 5): the session checkpoint dir is set once by
    design (warn-don't-rehome, operators/checkpointing.py pin), so
    per-test tmp_path roots made later tests trip the conflict warning
    incidentally — test isolation then depended on the warn path. With a
    single session root, pin's repeat call is the designed silent no-op;
    the warn path is exercised solely by the dedicated conflict test
    (test_pin_conflicting_checkpoint_dir_warns_and_keeps_session_dir),
    and pyproject.toml escalates any OTHER occurrence of that warning to
    an error."""
    return str(tmp_path_factory.mktemp("session_ckpt"))
