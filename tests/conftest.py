import os
import pathlib

import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data" / "maxmind"

DB = {
    "city": str(DATA_DIR / "GeoIP2-City-Test.mmdb"),
    "city_lite": str(DATA_DIR / "GeoLite2-City-Test.mmdb"),
    "country": str(DATA_DIR / "GeoIP2-Country-Test.mmdb"),
    "country_lite": str(DATA_DIR / "GeoLite2-Country-Test.mmdb"),
    "asn": str(DATA_DIR / "GeoLite2-ASN-Test.mmdb"),
    "isp": str(DATA_DIR / "GeoIP2-ISP-Test.mmdb"),
    "domain": str(DATA_DIR / "GeoIP2-Domain-Test.mmdb"),
    "enterprise": str(DATA_DIR / "GeoIP2-Enterprise-Test.mmdb"),
    "anonymous": str(DATA_DIR / "GeoIP2-Anonymous-IP-Test.mmdb"),
}


@pytest.fixture(scope="session")
def db_paths():
    return DB


@pytest.fixture(scope="session")
def ray_session():
    """Ray is initialised ONCE per pytest session (see the task contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
