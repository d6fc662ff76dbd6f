"""Table readers/writers for the driver testdata and versioned layouts."""
