# sources: external formats -> DataFrames (WARC, ...)
