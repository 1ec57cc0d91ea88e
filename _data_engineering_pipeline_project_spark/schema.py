"""Declarative table registry: StructType + pk/fk/constraint metadata.

Replaces the reference's SQLAlchemy ``tables_config`` (reference
project/etl2.py:63-203): where the reference couples logical schema,
physical DDL and constraint metadata into Column objects, the engine keeps
a pure-metadata :class:`TableSchema` that quality-check operators, the SCD2
merge, and the load-order topology all consume. Spark enforces none of
PK/FK/length — they become *operators* (see operators/quality.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import types as T


@dataclass(frozen=True)
class ForeignKey:
    """FK edge: ``columns`` in the child reference ``ref_columns`` in ``ref_table``."""

    columns: tuple[str, ...]
    ref_table: str
    ref_columns: tuple[str, ...]


@dataclass(frozen=True)
class TableSchema:
    name: str
    struct: T.StructType
    primary_key: tuple[str, ...] = ()
    foreign_keys: tuple[ForeignKey, ...] = ()
    # SCD2 bookkeeping columns (reference etl2:111-112,137-138)
    scd2: bool = False
    # columns that must be non-null for the row to be "complete"
    # (reference Q6, dq:244-268)
    required: tuple[str, ...] = ()

    @property
    def columns(self) -> list[str]:
        return [f.name for f in self.struct.fields]

    def numeric_columns(self) -> list[str]:
        return [
            f.name
            for f in self.struct.fields
            if isinstance(f.dataType, T.NumericType)
        ]

    def string_columns(self) -> list[str]:
        return [
            f.name for f in self.struct.fields if isinstance(f.dataType, T.StringType)
        ]

    def timestamp_columns(self) -> list[str]:
        return [
            f.name
            for f in self.struct.fields
            if isinstance(f.dataType, (T.TimestampType, T.DateType))
        ]

    def to_ddl(self, fmt: str = "parquet", location: str | None = None) -> str:
        """S6 — CREATE TABLE DDL from the declared schema (the reference
        drives physical DDL from the same metadata via
        ``MetaData.create_all``, etl2:262-267). PK/FK are emitted as
        comments: Spark doesn't enforce constraints — the quality
        operators do."""
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in self.struct.fields
        )
        comments = []
        if self.primary_key:
            comments.append(f"-- PRIMARY KEY ({', '.join(self.primary_key)})")
        for fk in self.foreign_keys:
            comments.append(
                f"-- FOREIGN KEY ({', '.join(fk.columns)}) REFERENCES "
                f"{fk.ref_table}({', '.join(fk.ref_columns)})"
            )
        loc = f"\nLOCATION '{location}'" if location else ""
        comment_block = ("\n" + "\n".join(comments)) if comments else ""
        return (
            f"CREATE TABLE IF NOT EXISTS {self.name} (\n  {cols}\n)"
            f"\nUSING {fmt}{loc};{comment_block}"
        )


@dataclass
class SchemaRegistry:
    """Catalog of declared table schemas + FK topology.

    ``load_order()`` re-expresses the reference's hand-maintained
    ``table_order`` list (etl2:418-430) as a topological sort of the FK
    graph — parents before children, derived instead of maintained.
    """

    tables: dict[str, TableSchema] = field(default_factory=dict)

    def register(self, schema: TableSchema) -> TableSchema:
        self.tables[schema.name] = schema
        return schema

    def __getitem__(self, name: str) -> TableSchema:
        return self.tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.tables

    def load_order(self) -> list[str]:
        ts: TopologicalSorter[str] = TopologicalSorter()
        for name, tbl in self.tables.items():
            deps = {
                fk.ref_table
                for fk in tbl.foreign_keys
                if fk.ref_table in self.tables and fk.ref_table != name
            }
            ts.add(name, *deps)
        return list(ts.static_order())


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def tpch_registry() -> SchemaRegistry:
    """Registry for the driver's TPC-H-ish testdata (TESTDATA.md)."""
    r = SchemaRegistry()
    S, I, L, D, TS = (
        T.StringType(),
        T.IntegerType(),
        T.LongType(),
        T.DoubleType(),
        T.TimestampType(),
    )
    r.register(
        TableSchema(
            "region",
            _st(("r_regionkey", I), ("r_name", S)),
            primary_key=("r_regionkey",),
        )
    )
    r.register(
        TableSchema(
            "nation",
            _st(("n_nationkey", I), ("n_name", S), ("n_regionkey", I)),
            primary_key=("n_nationkey",),
            foreign_keys=(ForeignKey(("n_regionkey",), "region", ("r_regionkey",)),),
        )
    )
    r.register(
        TableSchema(
            "customer",
            _st(
                ("c_custkey", L),
                ("c_name", S),
                ("c_nationkey", I),
                ("c_acctbal", D),
                ("c_mktsegment", S),
            ),
            primary_key=("c_custkey",),
            foreign_keys=(ForeignKey(("c_nationkey",), "nation", ("n_nationkey",)),),
        )
    )
    r.register(
        TableSchema(
            "supplier",
            _st(("s_suppkey", L), ("s_name", S), ("s_nationkey", I), ("s_acctbal", D)),
            primary_key=("s_suppkey",),
            foreign_keys=(ForeignKey(("s_nationkey",), "nation", ("n_nationkey",)),),
        )
    )
    r.register(
        TableSchema(
            "part",
            _st(
                ("p_partkey", L),
                ("p_name", S),
                ("p_brand", S),
                ("p_type", S),
                ("p_size", I),
                ("p_retailprice", D),
            ),
            primary_key=("p_partkey",),
            required=("p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
        )
    )
    r.register(
        TableSchema(
            "orders",
            _st(
                ("o_orderkey", L),
                ("o_custkey", L),
                ("o_orderstatus", S),
                ("o_totalprice", D),
                ("o_orderdate", TS),
                ("o_orderpriority", S),
            ),
            primary_key=("o_orderkey",),
            foreign_keys=(ForeignKey(("o_custkey",), "customer", ("c_custkey",)),),
        )
    )
    r.register(
        TableSchema(
            "lineitem",
            _st(
                ("l_orderkey", L),
                ("l_partkey", L),
                ("l_suppkey", L),
                ("l_linenumber", I),
                ("l_quantity", D),
                ("l_extendedprice", D),
                ("l_discount", D),
                ("l_tax", D),
                ("l_returnflag", S),
                ("l_linestatus", S),
                ("l_shipdate", TS),
            ),
            primary_key=("l_orderkey", "l_linenumber"),
            foreign_keys=(
                ForeignKey(("l_orderkey",), "orders", ("o_orderkey",)),
                ForeignKey(("l_partkey",), "part", ("p_partkey",)),
                ForeignKey(("l_suppkey",), "supplier", ("s_suppkey",)),
            ),
        )
    )
    r.register(
        TableSchema(
            "events",
            _st(
                ("event_id", L),
                ("ts", TS),
                ("user_id", L),
                ("event_type", S),
                ("value", D),
                ("props", S),
            ),
            primary_key=("event_id",),
        )
    )
    r.register(
        TableSchema(
            "documents",
            _st(
                ("doc_id", L),
                ("text", S),
                ("lang", S),
                ("source", S),
                ("n_chars", L),
            ),
            primary_key=("doc_id",),
        )
    )
    r.register(
        TableSchema(
            "embeddings",
            _st(
                ("vec_id", L),
                ("embedding", T.ArrayType(T.FloatType())),
                ("label", I),
            ),
            primary_key=("vec_id",),
        )
    )
    return r


def olist_registry() -> SchemaRegistry:
    """Olist-shaped registry mirroring the reference's declared model
    (reference project/etl2.py:63-203; see FIXTURES.md §A). Used by unit
    tests and the pipeline driver to prove reference parity.
    """
    r = SchemaRegistry()
    S, I, D, TS, B = (
        T.StringType(),
        T.LongType(),
        T.DoubleType(),
        T.TimestampType(),
        T.BooleanType(),
    )
    r.register(
        TableSchema(
            "product_category_name_translation",
            _st(("product_category_name", S), ("product_category_name_english", S)),
            primary_key=("product_category_name",),
        )
    )
    r.register(
        TableSchema(
            "customers",
            _st(
                ("customer_id", S),
                ("customer_unique_id", S),
                ("customer_zip_code_prefix", I),
                ("customer_city", S),
                ("customer_state", S),
            ),
            primary_key=("customer_id",),
        )
    )
    r.register(
        TableSchema(
            "geolocation",
            _st(
                ("geolocation_zip_code_prefix", I),
                ("geolocation_lat", D),
                ("geolocation_lng", D),
                ("geolocation_city", S),
                ("geolocation_state", S),
            ),
        )
    )
    r.register(
        TableSchema(
            "orders",
            _st(
                ("order_id", S),
                ("customer_id", S),
                ("order_status", S),
                ("order_purchase_timestamp", TS),
                ("order_approved_at", TS),
                ("order_delivered_carrier_date", TS),
                ("order_delivered_customer_date", TS),
                ("order_estimated_delivery_date", TS),
            ),
            primary_key=("order_id",),
            foreign_keys=(ForeignKey(("customer_id",), "customers", ("customer_id",)),),
        )
    )
    r.register(
        TableSchema(
            "products",
            _st(
                ("product_id", S),
                ("product_category_name", S),
                ("product_name_lenght", I),  # sic — reference spelling (etl2:105)
                ("product_description_lenght", I),
                ("product_photos_qty", I),
                ("product_weight_g", I),
                ("product_length_cm", I),
                ("product_height_cm", I),
                ("product_width_cm", I),
                ("updated_at", TS),
                ("is_deleted", B),
            ),
            primary_key=("product_id",),
            foreign_keys=(
                ForeignKey(
                    ("product_category_name",),
                    "product_category_name_translation",
                    ("product_category_name",),
                ),
            ),
            scd2=True,
            required=(
                "product_name_lenght",
                "product_description_lenght",
                "product_photos_qty",
                "product_weight_g",
                "product_length_cm",
                "product_height_cm",
            ),
        )
    )
    r.register(
        TableSchema(
            "sellers",
            _st(
                ("seller_id", S),
                ("seller_zip_code_prefix", I),
                ("seller_city", S),
                ("seller_state", S),
                ("updated_at", TS),
                ("is_deleted", B),
            ),
            primary_key=("seller_id",),
            scd2=True,
        )
    )
    r.register(
        TableSchema(
            "order_items",
            _st(
                ("order_id", S),
                ("order_item_id", I),
                ("product_id", S),
                ("seller_id", S),
                ("shipping_limit_date", TS),
                ("price", D),
                ("freight_value", D),
            ),
            primary_key=("order_id", "order_item_id", "product_id"),
            foreign_keys=(ForeignKey(("order_id",), "orders", ("order_id",)),),
        )
    )
    r.register(
        TableSchema(
            "order_payments",
            _st(
                ("order_id", S),
                ("payment_sequential", I),
                ("payment_type", S),
                ("payment_installments", I),
                ("payment_value", D),
            ),
            primary_key=("order_id", "payment_sequential"),
            foreign_keys=(ForeignKey(("order_id",), "orders", ("order_id",)),),
        )
    )
    r.register(
        TableSchema(
            "order_reviews",
            _st(
                ("review_id", S),
                ("order_id", S),
                ("review_score", I),
                ("review_comment_title", S),
                ("review_comment_message", S),
                ("review_creation_date", TS),
                ("review_answer_timestamp", TS),
            ),
            primary_key=("review_id", "order_id"),
            foreign_keys=(ForeignKey(("order_id",), "orders", ("order_id",)),),
        )
    )
    return r
