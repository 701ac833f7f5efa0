"""Flights-domain medallion pipeline — the reference's end-user capability
(US DOT BTS on-time performance lakehouse), re-expressed as thin
compositions of this engine's generic operators.

A user of the reference runs: bronze ingest (CSV + lookups + lineage) →
silver clean/enrich (34-col schema) → gold star schema (5 dims + fact) →
3 aggregate marts. Every stage here is a pure DataFrame→DataFrame
function; orchestration and IO live in pipeline.py.
"""
