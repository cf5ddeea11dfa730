"""Sources: synthetic image+caption tables, testdata loaders, image codec."""
