"""Jitted training/eval: losses, metrics, steps, engine, schedules."""
