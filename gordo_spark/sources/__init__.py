from gordo_spark.sources.providers import (
    DataProvider,
    ParquetDataProvider,
    RandomDataProvider,
    EventsAsSensorProvider,
    provider_from_dict,
    register_provider,
)

__all__ = [
    "DataProvider",
    "ParquetDataProvider",
    "RandomDataProvider",
    "EventsAsSensorProvider",
    "provider_from_dict",
    "register_provider",
]
