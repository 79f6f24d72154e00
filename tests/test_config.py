"""Config resolution parity — target defaults, ECS auto-derivation and
validation errors (geoip.rb:98-145; geoip_ecs_spec.rb:194-279)."""

import pytest

from logstash_filter_geoip_ray.functions.config import (
    ConfigurationError,
    GeoIPConfig,
    derive_ecs_target,
)


def _cfg(**kw):
    kw.setdefault("source", "message")
    kw.setdefault("database", "x.mmdb")
    return GeoIPConfig(**kw)


def test_default_target_legacy():
    assert _cfg().resolved_target() == "geoip"


def test_explicit_target_wins():
    assert _cfg(target="dest").resolved_target() == "dest"


def test_ecs_target_derived_from_ip_subfield():
    cfg = _cfg(source="[client][ip]", ecs_compatibility="v1")
    assert cfg.resolved_target() == "client"
    cfg = _cfg(source="[host][ip]", ecs_compatibility="v1")
    assert cfg.resolved_target() == "host"


def test_ecs_target_required_error():
    cfg = _cfg(source="message", ecs_compatibility="v1")
    with pytest.raises(ConfigurationError, match="requires a `target`"):
        cfg.resolved_target()
    with pytest.raises(ConfigurationError):
        derive_ecs_target("ip")  # bare "ip" is not an `[ip]` sub-field


def test_bare_ip_source_not_derivable():
    with pytest.raises(ConfigurationError):
        GeoIPConfig(source="[ip]", database="x", ecs_compatibility="v1").resolved_target()


def test_ecs_target_normalization_and_warning():
    cfg = _cfg(source="message", target="[host]", ecs_compatibility="v1")
    assert cfg.resolved_target() == "host"
    assert cfg.ecs_target_warning() is None
    cfg = _cfg(source="message", target="custom", ecs_compatibility="v1")
    warning = cfg.ecs_target_warning()
    assert warning is not None and "`custom`" in warning


def test_v8_is_alias_of_v1():
    cfg = _cfg(source="[source][ip]", ecs_compatibility="v8")
    assert cfg.ecs and cfg.resolved_target() == "source"


def test_invalid_ecs_mode():
    with pytest.raises(ConfigurationError, match="Unknown ECS version"):
        _cfg(ecs_compatibility="v99")


def test_cache_size_positive():
    with pytest.raises(ConfigurationError):
        _cfg(cache_size=0)


def test_defaults_match_reference():
    cfg = _cfg()
    assert cfg.cache_size == 1000
    assert cfg.tag_on_failure == ("_geoip_lookup_failure",)
    assert cfg.ecs_compatibility == "disabled"
