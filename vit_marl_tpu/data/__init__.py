"""L1: LOBSTER data ingestion + synthetic data generation."""

from vit_marl_tpu.data.lobster import (  # noqa: F401
    LoadedData,
    LobsterLoader,
    load_data,
)
from vit_marl_tpu.data.synthetic import (  # noqa: F401
    SyntheticDay,
    generate_day,
    write_day_csvs,
)
