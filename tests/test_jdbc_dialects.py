"""Derby-vs-Postgres dialect matrix — the COVERAGE.md scope note, made
executable.

The reference's sink is Postgres (utils/db_manager.py:18); this
sandbox has no Postgres socket, so the jdbc_* queries prove D1-D4
semantics against embedded Derby. COVERAGE.md claims the remaining
delta is confined to Spark's JdbcDialects type-mapping layer — these
tests pin that claim against the REAL dialect implementations Spark
would use on a live Postgres wire (org.apache.spark.sql.jdbc
.PostgresDialect), so any Spark upgrade or dialect drift that would
change the DDL emitted at a customer's Postgres shows up here, not in
production.
"""

from __future__ import annotations

import pytest

from finance_etl_spark.io.ddl import config_type_to_spark


def _resolve(spark, dialect, dt_java):
    """Database type definition the dialect would emit for a catalyst
    type — dialect override first, JdbcUtils common fallback second
    (exactly JdbcUtils.getJdbcType's resolution order)."""
    jvm = spark._jvm
    o = dialect.getJDBCType(dt_java)
    if o.isDefined():
        return o.get().databaseTypeDefinition()
    c = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils.getCommonJDBCType(
        dt_java
    )
    assert c.isDefined(), f"no JDBC mapping for {dt_java}"
    return c.get().databaseTypeDefinition()


@pytest.fixture(scope="module")
def dialects(spark):
    jd = spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects
    return {
        "postgres": jd.get("jdbc:postgresql://localhost/db"),
        "derby": jd.get("jdbc:derby:memory:db"),
    }


def _types(spark):
    T = spark._jvm.org.apache.spark.sql.types.DataTypes
    dec = spark._jvm.org.apache.spark.sql.types.DecimalType
    return {
        "string": T.StringType,
        "int": T.IntegerType,
        "long": T.LongType,
        "double": T.DoubleType,
        "float": T.FloatType,
        "boolean": T.BooleanType,
        "date": T.DateType,
        "timestamp": T.TimestampType,
        "timestamp_ntz": T.TimestampNTZType,
        "binary": T.BinaryType,
        "short": T.ShortType,
        "byte": T.ByteType,
        "decimal(10,2)": dec(10, 2),
    }


# The full matrix, measured against Spark 4.1's shipped dialects. The
# PAIRS THAT DIFFER are the documented migration surface: TEXT/CLOB,
# FLOAT8/DOUBLE PRECISION, FLOAT4/REAL, TIMESTAMPTZ/TIMESTAMP,
# BYTEA/BLOB, NUMERIC/DECIMAL.
EXPECTED = {
    "string": {"postgres": "TEXT", "derby": "CLOB"},
    "int": {"postgres": "INTEGER", "derby": "INTEGER"},
    "long": {"postgres": "BIGINT", "derby": "BIGINT"},
    "double": {"postgres": "FLOAT8", "derby": "DOUBLE PRECISION"},
    "float": {"postgres": "FLOAT4", "derby": "REAL"},
    "boolean": {"postgres": "BOOLEAN", "derby": "BOOLEAN"},
    "date": {"postgres": "DATE", "derby": "DATE"},
    "timestamp": {
        "postgres": "TIMESTAMP WITH TIME ZONE",
        "derby": "TIMESTAMP",
    },
    "timestamp_ntz": {"postgres": "TIMESTAMP", "derby": "TIMESTAMP"},
    "binary": {"postgres": "BYTEA", "derby": "BLOB"},
    "short": {"postgres": "SMALLINT", "derby": "SMALLINT"},
    "byte": {"postgres": "SMALLINT", "derby": "SMALLINT"},
    "decimal(10,2)": {"postgres": "NUMERIC(10,2)", "derby": "DECIMAL(10,2)"},
}


def test_type_matrix_pinned(spark, dialects):
    types = _types(spark)
    got = {
        name: {
            d: _resolve(spark, dialect, dt)
            for d, dialect in dialects.items()
        }
        for name, dt in types.items()
    }
    assert got == EXPECTED


def test_reference_ddl_vocabulary_portable(spark, dialects):
    """Every type the reference's YAML DDL vocabulary can produce
    (db_init.py:20-43 -> io/ddl.py::config_type_to_spark) resolves to a
    concrete column type on BOTH dialects — the engine's DDL layer has
    no Derby-only type."""
    configs = [
        {"type": "Integer"},
        {"type": "String", "length": 64},
        {"type": "Date"},
        {"type": "Decimal", "precision": 12, "scale": 2},
        {"type": "Timestamp", "timezone": True},
        {"type": "Timestamp"},
    ]
    for cfg in configs:
        spark_type = config_type_to_spark(cfg)
        dt_java = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(
            spark_type.json()
        )
        for d, dialect in dialects.items():
            db_type = _resolve(spark, dialect, dt_java)
            assert db_type and db_type != "UNSUPPORTED", (cfg, d)


def test_timestamptz_delta_documented(spark, dialects):
    """THE semantic (not just spelling) delta: Spark's TimestampType
    lands as TIMESTAMP WITH TIME ZONE on Postgres but plain TIMESTAMP
    on Derby — instants survive the Postgres wire with their zone,
    while the Derby roundtrip relies on the session staying UTC (which
    session.configure pins). TimestampNTZType is plain TIMESTAMP on
    both, so NTZ data is dialect-neutral."""
    T = spark._jvm.org.apache.spark.sql.types.DataTypes
    assert _resolve(spark, dialects["postgres"], T.TimestampType) == (
        "TIMESTAMP WITH TIME ZONE"
    )
    assert _resolve(spark, dialects["derby"], T.TimestampType) == "TIMESTAMP"
    for d in dialects.values():
        assert _resolve(spark, d, T.TimestampNTZType) == "TIMESTAMP"


def test_identifier_quoting_agrees(spark, dialects):
    """Both dialects double-quote identifiers, so the mixed-case table
    and column names io/sinks.py emits behave identically."""
    for d in dialects.values():
        assert d.quoteIdentifier("Mixed_Case") == '"Mixed_Case"'
