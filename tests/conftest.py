from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from tb_lakehouse_enhanced_spark.session import get_session
    s = get_session("tb-lakehouse-tests", cpus=8)
    yield s


@pytest.fixture()
def tmp_base(tmp_path):
    return str(tmp_path)
