"""Sources: document readers/adapters, demo corpus, synthetic corpus."""
