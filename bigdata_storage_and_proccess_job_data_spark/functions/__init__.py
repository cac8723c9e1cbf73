"""Scalar expression library: native Column builders only (no Python UDFs
in the hot path -- everything stays inside whole-stage codegen)."""
