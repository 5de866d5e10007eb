# Namespace anchor for the protoshim's google.protobuf stand-in.  This
# directory is only ever put on sys.path when the real google package is
# absent (protoshim.activate()), so it can never shadow a real install.
