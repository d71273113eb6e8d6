"""CPU reference oracles for estimator and gradient parity testing."""
