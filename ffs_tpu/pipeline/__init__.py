"""CLI pipeline executables: spotfinder, indexer, predictor, integrator."""
