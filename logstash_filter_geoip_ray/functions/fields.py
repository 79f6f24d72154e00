"""Output-field vocabulary and database-type registry.

Re-creates the closed 28-field enum of the reference
(``/root/reference/src/main/java/org/logstash/filters/geoip/Field.java:26-55``)
with its legacy/ECS name duals, and the database-type → default-field-set
registry (``.../Database.java:9-124``). Pure data + pure functions; no Ray.
"""

from __future__ import annotations

import enum
from typing import FrozenSet, List, Optional, Sequence


class Field(enum.Enum):
    """(ecs_name, legacy_name) pairs — Field.java:26-55. An empty ECS name
    means the field is skipped entirely in ECS mode (COUNTRY_CODE3,
    Field.java:35 + GeoIPFilter.java:227-229)."""

    AUTONOMOUS_SYSTEM_NUMBER = ("as.number", "asn")
    AUTONOMOUS_SYSTEM_ORGANIZATION = ("as.organization.name", "as_org")
    CITY_NAME = ("geo.city_name", "city_name")
    COUNTRY_NAME = ("geo.country_name", "country_name")
    CONTINENT_CODE = ("geo.continent_code", "continent_code")
    CONTINENT_NAME = ("geo.continent_name", "continent_name")
    COUNTRY_CODE2 = ("geo.country_iso_code", "country_code2")
    COUNTRY_CODE3 = ("", "country_code3")
    DOMAIN = ("domain", "domain")
    IP = ("ip", "ip")
    ISP = ("mmdb.isp", "isp")
    POSTAL_CODE = ("geo.postal_code", "postal_code")
    DMA_CODE = ("mmdb.dma_code", "dma_code")
    REGION_NAME = ("geo.region_name", "region_name")
    REGION_CODE = ("geo.region_code", "region_code")
    REGION_ISO_CODE = ("geo.region_iso_code", "region_iso_code")
    TIMEZONE = ("geo.timezone", "timezone")
    LOCATION = ("geo.location", "location")
    LATITUDE = ("geo.location.lat", "latitude")
    LONGITUDE = ("geo.location.lon", "longitude")
    ORGANIZATION = ("mmdb.organization", "organization")
    NETWORK = ("ip_traits.network", "network")
    HOSTING_PROVIDER = ("ip_traits.hosting_provider", "hosting_provider")
    TOR_EXIT_NODE = ("ip_traits.tor_exit_node", "tor_exit_node")
    ANONYMOUS_VPN = ("ip_traits.anonymous_vpn", "anonymous_vpn")
    ANONYMOUS = ("ip_traits.anonymous", "anonymous")
    PUBLIC_PROXY = ("ip_traits.public_proxy", "public_proxy")
    RESIDENTIAL_PROXY = ("ip_traits.residential_proxy", "residential_proxy")

    @property
    def ecs_name(self) -> str:
        return self.value[0]

    @property
    def legacy_name(self) -> str:
        return self.value[1]

    def field_path(self, ecs: bool) -> tuple:
        """Flattened field path relative to the target: legacy is a single
        flat name; ECS is the dot-path split into fragments (the bracket
        field-reference of Field.java:107-111 without the brackets).
        Empty tuple = skipped-in-ECS field."""
        name = self.ecs_name if ecs else self.legacy_name
        if not name:
            return ()
        return tuple(name.split("."))


_VALID_VALUES_MSG = (
    "[AUTONOMOUS_SYSTEM_NUMBER, AUTONOMOUS_SYSTEM_ORGANIZATION, CITY_NAME, "
    "COUNTRY_NAME, CONTINENT_CODE, CONTINENT_NAME, COUNTRY_CODE2, COUNTRY_CODE3, "
    "DOMAIN, IP, ISP, POSTAL_CODE, DMA_CODE, REGION_NAME, REGION_CODE, "
    "REGION_ISO_CODE, TIMEZONE, LOCATION, LATITUDE, LONGITUDE, ORGANIZATION, "
    "NETWORK, HOSTING_PROVIDER, TOR_EXIT_NODE, ANONYMOUS_VPN, ANONYMOUS, "
    "PUBLIC_PROXY, RESIDENTIAL_PROXY]"
)


def parse_field(value: str) -> Field:
    """Case-insensitive enum parse with the reference's error message
    (Field.parseField, Field.java:92-100; FieldTest.java:13-24)."""
    try:
        return Field[value.upper()]
    except KeyError:
        raise ValueError(
            "illegal field value %s. valid values are %s" % (value, _VALID_VALUES_MSG)
        ) from None


_ANONYMOUS_TRAITS: FrozenSet[Field] = frozenset(
    {
        Field.HOSTING_PROVIDER,
        Field.TOR_EXIT_NODE,
        Field.ANONYMOUS_VPN,
        Field.ANONYMOUS,
        Field.PUBLIC_PROXY,
        Field.RESIDENTIAL_PROXY,
    }
)


class DatabaseType(enum.Enum):
    """MMDB database type → (match token, default field set) — Database.java:7-124."""

    CITY = (
        "City",
        frozenset(
            {
                Field.IP,
                Field.CITY_NAME,
                Field.CONTINENT_CODE,
                Field.COUNTRY_NAME,
                Field.COUNTRY_CODE2,
                Field.COUNTRY_CODE3,
                Field.POSTAL_CODE,
                Field.DMA_CODE,
                Field.REGION_NAME,
                Field.REGION_ISO_CODE,
                Field.TIMEZONE,
                Field.LOCATION,
                Field.LATITUDE,
                Field.LONGITUDE,
            }
        ),
    )
    COUNTRY = (
        "Country",
        frozenset({Field.IP, Field.COUNTRY_CODE2, Field.COUNTRY_NAME, Field.CONTINENT_NAME}),
    )
    DOMAIN = ("GeoIP2-Domain", frozenset({Field.DOMAIN}))
    ASN = (
        "GeoLite2-ASN",
        frozenset(
            {Field.IP, Field.AUTONOMOUS_SYSTEM_NUMBER, Field.AUTONOMOUS_SYSTEM_ORGANIZATION}
        ),
    )
    ISP = (
        "GeoIP2-ISP",
        frozenset(
            {
                Field.IP,
                Field.AUTONOMOUS_SYSTEM_NUMBER,
                Field.AUTONOMOUS_SYSTEM_ORGANIZATION,
                Field.ISP,
                Field.ORGANIZATION,
            }
        ),
    )
    ANONYMOUS_IP = ("GeoIP2-Anonymous-IP", _ANONYMOUS_TRAITS)
    ENTERPRISE = (
        "Enterprise",
        frozenset(
            {
                Field.IP,
                Field.COUNTRY_CODE2,
                Field.COUNTRY_NAME,
                Field.CONTINENT_NAME,
                Field.REGION_ISO_CODE,
                Field.REGION_NAME,
                Field.CITY_NAME,
                Field.LOCATION,
            }
        ),
    )
    UNKNOWN = ("Unknown", frozenset())

    @property
    def match_token(self) -> str:
        return self.value[0]

    @property
    def default_fields(self) -> FrozenSet[Field]:
        return self.value[1]


def database_from_type_string(type_string: str) -> DatabaseType:
    """Substring-match detection in the reference's precedence order
    (Database.fromDatabaseType, Database.java:102-124): City before Country
    before Domain/ASN/ISP/Enterprise/Anonymous-IP; no match → UNKNOWN so the
    pipeline still starts."""
    order = (
        DatabaseType.CITY,
        DatabaseType.COUNTRY,
        DatabaseType.DOMAIN,
        DatabaseType.ASN,
        DatabaseType.ISP,
        DatabaseType.ENTERPRISE,
        DatabaseType.ANONYMOUS_IP,
    )
    for db in order:
        if db.match_token in type_string:
            return db
    return DatabaseType.UNKNOWN


def resolve_desired_fields(
    db_type: DatabaseType,
    fields: Optional[Sequence[str]],
    ecs: bool,
) -> FrozenSet[Field]:
    """User ``fields`` list (case-insensitive, invalid → error) or the DB's
    default set; CITY with ECS disabled swaps REGION_ISO_CODE → REGION_CODE
    (GeoIPFilter.createDesiredFields/createCityDefaultFields,
    GeoIPFilter.java:121-146)."""
    if fields:
        return frozenset(parse_field(f) for f in fields)
    if db_type is DatabaseType.CITY and not ecs:
        swapped = set(db_type.default_fields)
        swapped.discard(Field.REGION_ISO_CODE)
        swapped.add(Field.REGION_CODE)
        return frozenset(swapped)
    return db_type.default_fields


# Field order used for the output struct schema: deterministic, legacy-name
# alphabetical within each of the reference's projections' union. A stable
# order keeps Arrow schemas identical across batches and actors.
FIELD_ORDER: List[Field] = list(Field)
