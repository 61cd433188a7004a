from gordo_spark.sources.providers import (
    DataProvider,
    ParquetDataProvider,
    RandomDataProvider,
    EventsAsSensorProvider,
    provider_from_dict,
    register_provider,
)
# imported for its @register_provider side effect: SensorLakeProvider must be
# resolvable from config dicts without anyone importing the module explicitly
from gordo_spark.sources.lake import SensorLakeProvider, write_sensor_lake

__all__ = [
    "SensorLakeProvider",
    "write_sensor_lake",
    "DataProvider",
    "ParquetDataProvider",
    "RandomDataProvider",
    "EventsAsSensorProvider",
    "provider_from_dict",
    "register_provider",
]
