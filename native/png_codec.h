// PNG decode/encode for the native data loader.
//
// The reference's data path is C++ (ROS rosbag playback + OpenCV imread,
// SURVEY.md L4 "rosbag playback of TUM sequences" — reference mount empty,
// layering per SURVEY.md §1); this is the TPU-framework equivalent: a
// minimal, dependency-light image codec (libpng/zlib only, no OpenCV)
// feeding host buffers that the Python layer ships to the device.
//
// Supported formats cover the TUM RGB-D benchmark exactly:
//   - 8-bit RGB / RGBA / gray / palette  -> decoded as 8-bit, 1 or 3 channels
//   - 16-bit gray (TUM depth maps)       -> decoded as uint16 host-endian
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace popup {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;       // 1 or 3
  int bit_depth = 0;      // 8 or 16
  // 8-bit data lives in u8 (h*w*c); 16-bit in u16 (h*w, channels==1).
  std::vector<uint8_t> u8;
  std::vector<uint16_t> u16;

  size_t num_bytes() const {
    return bit_depth == 16 ? u16.size() * 2 : u8.size();
  }
};

// Decode a PNG file. Returns true on success; on failure fills *err.
bool DecodePng(const std::string& path, Image* out, std::string* err);

// Encode an image to a PNG file (8-bit gray/RGB or 16-bit gray).
bool EncodePng(const std::string& path, const Image& img, std::string* err);

}  // namespace popup
