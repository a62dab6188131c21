"""Pipeline spec -> assembled streaming query (the 'compiler')."""
