from pygat_tpu.data.citation import CitationDataset, dataset_stats, load_citation  # noqa: F401
