"""CLI entry points mirroring the reference's scripts/ surface."""
