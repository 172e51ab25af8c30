"""Device-side ops: preprocessing, labeling, assignment, GSFF filtering."""
