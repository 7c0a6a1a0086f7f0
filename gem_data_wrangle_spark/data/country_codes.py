"""Packaged country-code dimension.

Replaces the reference's ``countrycode`` R package call
(``GEM/Coalplants_GEM.R:200-201``, iso3→iso2 ``GEM/TotalData_GEM.R:101-103``)
with a broadcast dimension table — the Spark-native form of a scalar
lookup function. Includes the reference's manual Kosovo→XK override as
data. Compiled from the public ISO 3166-1 assignments (not copied from
any package source). Deliberately covers the GEM-tracker country
universe; unmapped names yield NULL iso2, matching ``countrycode``'s
warning-to-NA behaviour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (country_name, iso2, iso3)
COUNTRY_CODES: list[tuple[str, str, str]] = [
    ("Afghanistan", "AF", "AFG"), ("Albania", "AL", "ALB"), ("Algeria", "DZ", "DZA"),
    ("Angola", "AO", "AGO"), ("Argentina", "AR", "ARG"), ("Armenia", "AM", "ARM"),
    ("Australia", "AU", "AUS"), ("Austria", "AT", "AUT"), ("Azerbaijan", "AZ", "AZE"),
    ("Bangladesh", "BD", "BGD"), ("Belarus", "BY", "BLR"), ("Belgium", "BE", "BEL"),
    ("Bolivia", "BO", "BOL"), ("Bosnia and Herzegovina", "BA", "BIH"),
    ("Botswana", "BW", "BWA"), ("Brazil", "BR", "BRA"), ("Bulgaria", "BG", "BGR"),
    ("Cambodia", "KH", "KHM"), ("Cameroon", "CM", "CMR"), ("Canada", "CA", "CAN"),
    ("Chile", "CL", "CHL"), ("China", "CN", "CHN"), ("Colombia", "CO", "COL"),
    ("Costa Rica", "CR", "CRI"), ("Croatia", "HR", "HRV"), ("Cuba", "CU", "CUB"),
    ("Czech Republic", "CZ", "CZE"), ("Czechia", "CZ", "CZE"),
    ("DR Congo", "CD", "COD"), ("Democratic Republic of the Congo", "CD", "COD"),
    ("Denmark", "DK", "DNK"), ("Dominican Republic", "DO", "DOM"),
    ("Ecuador", "EC", "ECU"), ("Egypt", "EG", "EGY"), ("El Salvador", "SV", "SLV"),
    ("Estonia", "EE", "EST"), ("Ethiopia", "ET", "ETH"), ("Finland", "FI", "FIN"),
    ("France", "FR", "FRA"), ("Georgia", "GE", "GEO"), ("Germany", "DE", "DEU"),
    ("Ghana", "GH", "GHA"), ("Greece", "GR", "GRC"), ("Guatemala", "GT", "GTM"),
    ("Honduras", "HN", "HND"), ("Hungary", "HU", "HUN"), ("Iceland", "IS", "ISL"),
    ("India", "IN", "IND"), ("Indonesia", "ID", "IDN"), ("Iran", "IR", "IRN"),
    ("Iraq", "IQ", "IRQ"), ("Ireland", "IE", "IRL"), ("Israel", "IL", "ISR"),
    ("Italy", "IT", "ITA"), ("Ivory Coast", "CI", "CIV"),
    ("Côte d'Ivoire", "CI", "CIV"), ("Japan", "JP", "JPN"), ("Jordan", "JO", "JOR"),
    ("Kazakhstan", "KZ", "KAZ"), ("Kenya", "KE", "KEN"), ("Kosovo", "XK", "XKX"),
    ("Kuwait", "KW", "KWT"), ("Kyrgyzstan", "KG", "KGZ"), ("Laos", "LA", "LAO"),
    ("Latvia", "LV", "LVA"), ("Lebanon", "LB", "LBN"), ("Libya", "LY", "LBY"),
    ("Lithuania", "LT", "LTU"), ("Luxembourg", "LU", "LUX"),
    ("Madagascar", "MG", "MDG"), ("Malawi", "MW", "MWI"), ("Malaysia", "MY", "MYS"),
    ("Mali", "ML", "MLI"), ("Mexico", "MX", "MEX"), ("Moldova", "MD", "MDA"),
    ("Mongolia", "MN", "MNG"), ("Montenegro", "ME", "MNE"), ("Morocco", "MA", "MAR"),
    ("Mozambique", "MZ", "MOZ"), ("Myanmar", "MM", "MMR"), ("Namibia", "NA", "NAM"),
    ("Nepal", "NP", "NPL"), ("Netherlands", "NL", "NLD"),
    ("New Zealand", "NZ", "NZL"), ("Nicaragua", "NI", "NIC"),
    ("Niger", "NE", "NER"), ("Nigeria", "NG", "NGA"),
    ("North Korea", "KP", "PRK"), ("North Macedonia", "MK", "MKD"),
    ("Norway", "NO", "NOR"), ("Oman", "OM", "OMN"), ("Pakistan", "PK", "PAK"),
    ("Panama", "PA", "PAN"), ("Papua New Guinea", "PG", "PNG"),
    ("Paraguay", "PY", "PRY"), ("Peru", "PE", "PER"), ("Philippines", "PH", "PHL"),
    ("Poland", "PL", "POL"), ("Portugal", "PT", "PRT"), ("Qatar", "QA", "QAT"),
    ("Romania", "RO", "ROU"), ("Russia", "RU", "RUS"), ("Rwanda", "RW", "RWA"),
    ("Saudi Arabia", "SA", "SAU"), ("Senegal", "SN", "SEN"), ("Serbia", "RS", "SRB"),
    ("Singapore", "SG", "SGP"), ("Slovakia", "SK", "SVK"), ("Slovenia", "SI", "SVN"),
    ("South Africa", "ZA", "ZAF"), ("South Korea", "KR", "KOR"),
    ("Spain", "ES", "ESP"), ("Sri Lanka", "LK", "LKA"), ("Sudan", "SD", "SDN"),
    ("Sweden", "SE", "SWE"), ("Switzerland", "CH", "CHE"), ("Syria", "SY", "SYR"),
    ("Taiwan", "TW", "TWN"), ("Tajikistan", "TJ", "TJK"), ("Tanzania", "TZ", "TZA"),
    ("Thailand", "TH", "THA"), ("Tunisia", "TN", "TUN"), ("Turkey", "TR", "TUR"),
    ("Türkiye", "TR", "TUR"), ("Turkmenistan", "TM", "TKM"), ("Uganda", "UG", "UGA"),
    ("Ukraine", "UA", "UKR"), ("United Arab Emirates", "AE", "ARE"),
    ("United Kingdom", "GB", "GBR"), ("United States", "US", "USA"),
    ("Uruguay", "UY", "URY"), ("Uzbekistan", "UZ", "UZB"),
    ("Venezuela", "VE", "VEN"), ("Vietnam", "VN", "VNM"), ("Yemen", "YE", "YEM"),
    ("Zambia", "ZM", "ZMB"), ("Zimbabwe", "ZW", "ZWE"),
]


def country_dim(spark: SparkSession) -> DataFrame:
    """The dimension as a (tiny, broadcastable) DataFrame."""
    return spark.createDataFrame(
        COUNTRY_CODES, schema="country_name string, iso2 string, iso3 string"
    )
