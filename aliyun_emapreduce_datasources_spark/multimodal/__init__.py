"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media travels as opaque ``binary`` columns next to a typed
metadata struct (modality, format, width/height/duration, byte size,
content digest). All Spark-side plumbing — schema, partition sizing,
Arrow batch shape, mapInPandas signatures — is real and tested; only
the codec call itself is stubbed (this container ships no image/audio
libraries), clearly marked and swappable for PIL/ffmpeg decoders.

Scale notes: batches are bounded by bytes not rows
(``maxRecordsPerBatch`` alone is wrong for 10 MB blobs); decode
happens inside mapInPandas so blobs never hit the driver; derived
features (embeddings, thumbnails) return as new columns, keeping
lineage columnar.
"""
