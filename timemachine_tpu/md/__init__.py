"""MD orchestration: context (scan loop), barostat, movers, builders,
minimizer, samplers (HREX/SMC/exchange), local MD."""
