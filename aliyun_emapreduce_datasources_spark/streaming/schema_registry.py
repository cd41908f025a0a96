"""Schema-registry stand-in + subset-schema validation.

The corpus DDL retrieves each stream table's schema from a Kafka
schema registry and requires any user-declared schema to be a SUBSET
of the registered one (emr-baseline-testing/README.md DDL section;
SURVEY.md §7 hard part (e)). ``auto.register.schemas`` registers the
result schema of a sink table on first write (tables/
kafka_store_sales.sql OPTIONS).

This module is the registry contract on public Spark: versioned
subjects holding Avro schema JSON (file- or memory-backed), and the
subset check implemented as StructType containment — field names must
exist in the registered schema with identical types; nullability may
only *widen* (required registry field may be declared nullable by the
user, not the reverse).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.streaming.avro_codec import spark_schema_for

__all__ = ["SchemaRegistry", "SchemaValidationError", "validate_subset_schema"]


class SchemaValidationError(ValueError):
    pass


def validate_subset_schema(user: T.StructType, registered: T.StructType) -> None:
    """Raise unless ``user`` is a valid subset view of ``registered``
    (the README DDL rule): every user field exists in the registered
    schema with the same type; a required user field must be required
    in the registry too."""
    reg = {f.name: f for f in registered.fields}
    for f in user.fields:
        rf = reg.get(f.name)
        if rf is None:
            raise SchemaValidationError(
                f"field '{f.name}' not in registered schema (has: {sorted(reg)})"
            )
        if f.dataType != rf.dataType:
            raise SchemaValidationError(
                f"field '{f.name}': declared {f.dataType.simpleString()} "
                f"!= registered {rf.dataType.simpleString()}"
            )
        if not f.nullable and rf.nullable:
            raise SchemaValidationError(
                f"field '{f.name}': declared NOT NULL but registered nullable"
            )


class SchemaRegistry:
    """Versioned subject → Avro-schema store (Confluent-shaped API
    surface: register / latest / get_version / check)."""

    def __init__(self, path: str | None = None):
        self._path = path
        self._subjects: dict[str, list[str]] = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                self._subjects = json.load(fh)

    def _flush(self) -> None:
        if self._path:
            with open(self._path, "w") as fh:
                json.dump(self._subjects, fh)

    def register(self, subject: str, avro_json: str) -> int:
        """Idempotent append; returns the 1-based version. A schema
        already registered under the subject — at ANY version, not
        just the latest — returns its existing version id (the
        Confluent contract); otherwise a producer alternating two
        schemas would grow the subject unboundedly."""
        versions = self._subjects.setdefault(subject, [])
        for i, v in enumerate(versions):
            if v == avro_json:
                return i + 1
        versions.append(avro_json)
        self._flush()
        return len(versions)

    def latest(self, subject: str) -> str:
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(f"subject '{subject}' not registered")
        return versions[-1]

    def get_version(self, subject: str, version: int) -> str:
        return self._subjects[subject][version - 1]

    def latest_spark_schema(self, subject: str) -> T.StructType:
        return spark_schema_for(self.latest(subject))

    def check_user_schema(self, subject: str, user: T.StructType) -> T.StructType:
        """Validate a DDL-declared schema against the registry (raises
        SchemaValidationError) and return the registered schema."""
        registered = self.latest_spark_schema(subject)
        validate_subset_schema(user, registered)
        return registered
