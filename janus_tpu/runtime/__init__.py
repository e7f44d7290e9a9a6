"""Host runtime: phrase segmentation, session engine, link transport."""
