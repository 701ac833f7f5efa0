"""Silver cleaning stage — five pure df→df functions mirroring the
reference's ``flight_data_cleaner.py`` semantics exactly (cited per
function). Chain order matters and is fixed in ``clean_flights``:
datetime → missing values → types → business rules → text.

Everything is Column logic inside one whole-stage-codegen span — the whole
clean chain adds zero shuffles to the silver job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MILES_TO_KM = 1.60934

TIME_FIELDS = ("CRS_DEP_TIME", "DEP_TIME", "CRS_ARR_TIME", "ARR_TIME")
CODE_FIELDS = ("OP_UNIQUE_CARRIER", "ORIGIN", "DEST")


def clean_datetime_fields(df: DataFrame) -> DataFrame:
    """FLIGHT_DATE date column from the raw timestamp
    (reference flight_data_cleaner.py:44-57)."""
    return df.withColumn("FLIGHT_DATE", F.to_date("FL_DATE"))


def handle_missing_values(df: DataFrame) -> DataFrame:
    """Cancelled flights get their actual-time fields nulled (they never
    flew — zeros would poison averages); delay fields null→0 for flights
    that DID operate (reference flight_data_cleaner.py:10-42)."""
    # two withColumns batches instead of 11 chained withColumn calls:
    # every DataFrame op re-analyzes the whole 30+-column plan eagerly,
    # so the chain paid ~0.8s of driver time per invocation (r13, guide
    # §7.3 planning cost). Within each batch every expression references
    # only its own pre-batch column + CANCELLED, so batch == chain.
    cancelled = F.col("CANCELLED") == 1
    out = df.withColumns(
        {
            c: F.when(cancelled, F.lit(None)).otherwise(F.col(c))
            for c in ("DEP_TIME", "ARR_TIME", "DEP_DELAY", "DEP_DELAY_NEW",
                      "ARR_DELAY", "ARR_DELAY_NEW", "AIR_TIME")
        }
    )
    return out.withColumns(
        {
            c: F.when(~cancelled & F.col(c).isNull(), 0.0).otherwise(F.col(c))
            for c in ("DEP_DELAY", "DEP_DELAY_NEW", "ARR_DELAY",
                      "ARR_DELAY_NEW")
        }
    )


def _hhmm_to_colon(col: Column) -> Column:
    """'845'/'0845'/'2400' HHMM strings → 'HH:MM'
    (reference flight_data_cleaner.py:66-84 uses lpad+regexp; 2400 wraps
    to 00:00 as in the raw BTS feed)."""
    padded = F.lpad(col.cast("int").cast("string"), 4, "0")
    wrapped = F.when(padded == "2400", "0000").otherwise(padded)
    return F.regexp_replace(wrapped, r"(\d{2})(\d{2})", r"$1:$2")


def standardize_data_types(df: DataFrame) -> DataFrame:
    """HHMM→'HH:MM' strings, metric distance, boolean flags
    (reference flight_data_cleaner.py:59-98)."""
    # one withColumns batch (the handle_missing_values rationale): each
    # time field maps from itself; the three derived columns read only
    # untouched inputs
    return df.withColumns(
        {
            **{
                c: F.when(F.col(c).isNotNull(), _hhmm_to_colon(F.col(c)))
                for c in TIME_FIELDS
            },
            "DISTANCE_KM": F.col("DISTANCE") * MILES_TO_KM,
            "CANCELLED_BOOL": F.col("CANCELLED") == 1,
            "DIVERTED_BOOL": F.col("DIVERTED") == 1,
        }
    )


def validate_business_rules(df: DataFrame) -> DataFrame:
    """0/1 quality flags + DATA_QUALITY_SCORE = mean of five flags
    (reference flight_data_cleaner.py:100-125)."""
    # trim inside the flags: this stage runs before text standardization
    # (reference chain order), so padded codes must not fail validation
    flags = {
        "VALID_AIRPORTS": (F.length(F.trim(F.col("ORIGIN"))) == 3)
        & (F.length(F.trim(F.col("DEST"))) == 3),
        "VALID_DISTANCE": F.col("DISTANCE").isNotNull()
        & F.col("DISTANCE").between(0, 20000),
        "VALID_AIR_TIME": F.col("CANCELLED_BOOL")
        | (F.col("AIR_TIME").isNotNull() & (F.col("AIR_TIME") > 0)),
        "VALID_CARRIER": F.col("OP_UNIQUE_CARRIER").isNotNull()
        & F.length("OP_UNIQUE_CARRIER").between(2, 3),
        "VALID_DATE": F.col("FLIGHT_DATE").isNotNull(),
    }
    # one withColumns batch: the score sums the flag EXPRESSIONS (not the
    # flag columns), so simultaneous assignment equals the former chain
    bits = {name: F.when(cond, 1).otherwise(0) for name, cond in flags.items()}
    score = None
    for bit in bits.values():
        score = bit if score is None else (score + bit)
    return df.withColumns(
        {
            **bits,
            "DATA_QUALITY_SCORE": score.cast("double")
            / F.lit(float(len(flags))),
        }
    )


def standardize_text_fields(df: DataFrame) -> DataFrame:
    """Trim+upper all code fields (reference flight_data_cleaner.py:127-150)."""
    return df.withColumns(
        {c: F.upper(F.trim(F.col(c))) for c in CODE_FIELDS}
    )


def clean_flights(df: DataFrame) -> DataFrame:
    """The full cleaning chain (reference flights_silver_transform.py:27-47)."""
    return standardize_text_fields(
        validate_business_rules(
            standardize_data_types(handle_missing_values(clean_datetime_fields(df)))
        )
    )
