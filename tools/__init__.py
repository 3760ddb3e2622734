"""Repo tooling (driver-replica correctness gate, packaging, profiling).

A package so tests can import the gate's type-lattice helpers
(`tools.check_correctness.type_family`) — the oracle/engine TYPE contract
meta-test must use the SAME mapping the replica enforces.
"""
