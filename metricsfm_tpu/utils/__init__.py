"""Host-side helpers: EXIF, UTM, geo-verification, misc."""
