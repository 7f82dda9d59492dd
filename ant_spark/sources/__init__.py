"""Sources: synthetic web-graph generator, fixture site, testdata loaders."""
