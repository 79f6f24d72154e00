"""Field/Database vocabulary parity — mirrors FieldTest.java and
DatabaseTest.java from the reference."""

import pytest

from logstash_filter_geoip_ray.functions.fields import (
    DatabaseType,
    Field,
    database_from_type_string,
    parse_field,
    resolve_desired_fields,
)


def test_parse_field_case_insensitive():
    # FieldTest.java:13-18: lowercase ENUM NAMES are valid...
    for f in Field:
        assert parse_field(f.name.lower()) is f
    assert parse_field("AUTONOMOUS_SYSTEM_NUMBER") is Field.AUTONOMOUS_SYSTEM_NUMBER
    # ...but legacy aliases like "asn" are NOT (only DMA_CODE-style enum names)
    with pytest.raises(ValueError):
        parse_field("asn")


def test_parse_field_invalid_message():
    with pytest.raises(ValueError, match="illegal field value NOPE"):
        parse_field("NOPE")


def test_field_name_duals():
    # FieldTest.java:26-65 name table (spot vectors across the 28)
    assert Field.AUTONOMOUS_SYSTEM_NUMBER.legacy_name == "asn"
    assert Field.AUTONOMOUS_SYSTEM_NUMBER.ecs_name == "as.number"
    assert Field.AUTONOMOUS_SYSTEM_ORGANIZATION.ecs_name == "as.organization.name"
    assert Field.COUNTRY_CODE2.ecs_name == "geo.country_iso_code"
    assert Field.COUNTRY_CODE3.ecs_name == ""  # skipped in ECS mode
    assert Field.DMA_CODE.ecs_name == "mmdb.dma_code"
    assert Field.TOR_EXIT_NODE.ecs_name == "ip_traits.tor_exit_node"
    assert Field.IP.ecs_name == "ip" == Field.IP.legacy_name
    assert Field.LATITUDE.ecs_name == "geo.location.lat"


def test_field_paths():
    assert Field.COUNTRY_CODE2.field_path(False) == ("country_code2",)
    assert Field.COUNTRY_CODE2.field_path(True) == ("geo", "country_iso_code")
    assert Field.COUNTRY_CODE3.field_path(True) == ()
    assert Field.AUTONOMOUS_SYSTEM_ORGANIZATION.field_path(True) == (
        "as",
        "organization",
        "name",
    )


def test_default_fields_per_database():
    # DatabaseTest.java:34-125
    assert resolve_desired_fields(DatabaseType.COUNTRY, None, True) == frozenset(
        {Field.IP, Field.COUNTRY_CODE2, Field.COUNTRY_NAME, Field.CONTINENT_NAME}
    )
    assert resolve_desired_fields(DatabaseType.ASN, None, True) == frozenset(
        {Field.IP, Field.AUTONOMOUS_SYSTEM_NUMBER, Field.AUTONOMOUS_SYSTEM_ORGANIZATION}
    )
    assert resolve_desired_fields(DatabaseType.DOMAIN, None, True) == frozenset(
        {Field.DOMAIN}
    )
    assert len(DatabaseType.CITY.default_fields) == 14
    assert len(DatabaseType.ISP.default_fields) == 5
    assert len(DatabaseType.ANONYMOUS_IP.default_fields) == 6
    assert len(DatabaseType.ENTERPRISE.default_fields) == 8
    assert DatabaseType.UNKNOWN.default_fields == frozenset()


def test_city_ecs_disabled_swaps_region_code():
    # GeoIPFilter.createCityDefaultFields (GeoIPFilter.java:135-146)
    ecs_on = resolve_desired_fields(DatabaseType.CITY, None, True)
    ecs_off = resolve_desired_fields(DatabaseType.CITY, None, False)
    assert Field.REGION_ISO_CODE in ecs_on and Field.REGION_CODE not in ecs_on
    assert Field.REGION_CODE in ecs_off and Field.REGION_ISO_CODE not in ecs_off


def test_custom_fields_override():
    fields = resolve_desired_fields(DatabaseType.CITY, ["country_name", "CONTINENT_CODE"], False)
    assert fields == frozenset({Field.COUNTRY_NAME, Field.CONTINENT_CODE})


def test_from_database_type_strings():
    # DatabaseTest.java:145-162
    cases = {
        "GeoLite2-City": DatabaseType.CITY,
        "GeoIP2-City": DatabaseType.CITY,
        "GeoIP2-City-Africa": DatabaseType.CITY,
        "GeoIP2-City-Asia-Pacific": DatabaseType.CITY,
        "GeoIP2-City-Europe": DatabaseType.CITY,
        "GeoIP2-City-North-America": DatabaseType.CITY,
        "GeoIP2-City-South-America": DatabaseType.CITY,
        "GeoLite2-Country": DatabaseType.COUNTRY,
        "GeoIP2-Country": DatabaseType.COUNTRY,
        "GeoIP2-Domain": DatabaseType.DOMAIN,
        "GeoLite2-ASN": DatabaseType.ASN,
        "GeoIP2-ISP": DatabaseType.ISP,
        "GeoIP2-Anonymous-IP": DatabaseType.ANONYMOUS_IP,
        "Enterprise": DatabaseType.ENTERPRISE,
        "Something-Else": DatabaseType.UNKNOWN,
    }
    for type_string, expected in cases.items():
        assert database_from_type_string(type_string) is expected


def test_from_database_type_real_files(db_paths):
    # DatabaseTest.java:128-143: detection from real MMDB metadata
    from logstash_filter_geoip_ray.state.mmdb import MMDBReader

    expected = {
        "city": DatabaseType.CITY,
        "city_lite": DatabaseType.CITY,
        "country": DatabaseType.COUNTRY,
        "country_lite": DatabaseType.COUNTRY,
        "asn": DatabaseType.ASN,
        "isp": DatabaseType.ISP,
        "domain": DatabaseType.DOMAIN,
        "enterprise": DatabaseType.ENTERPRISE,
        "anonymous": DatabaseType.ANONYMOUS_IP,
    }
    for key, db_type in expected.items():
        with MMDBReader(db_paths[key]) as r:
            assert database_from_type_string(r.database_type) is db_type
