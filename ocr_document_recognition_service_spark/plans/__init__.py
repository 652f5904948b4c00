"""Named query plans + their ANSI-SQL oracles (driver contract)."""
