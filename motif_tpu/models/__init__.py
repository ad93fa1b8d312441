"""Network architectures (L2/L3): flow estimators and C-STVSR models."""
