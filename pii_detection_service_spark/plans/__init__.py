"""Physical plans: the flagship quality-filter + PII-scrub stage."""
