"""Storage formats: the txlog transactional table (see txlog.py)."""

from sf_epa_data_ingestion_spark.storage.txlog import (  # noqa: F401
    ConcurrentCommitError,
    TxTable,
)
