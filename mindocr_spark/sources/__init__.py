"""Sources/sinks for the reference's golden-file formats (FIXTURES.md F3-F5)."""
