"""Experimental / unwired code.

Modules here are verified (tested) demonstrations that are NOT part of
the production compute path. See each module's header for the measured
reason it is not wired in.
"""
