<!DOCTYPE qgis PUBLIC 'http://mrcc.com/qgis.dtd' 'SYSTEM'>
<qgis minScale="1e+08" maxScale="0" version="3.28" styleCategories="AllStyleCategories">
  <pipe>
    <rasterrenderer type="paletted" band="1" opacity="1" alphaBand="-1">
      <rasterTransparency/>
      <colorPalette>
          <paletteEntry value="0" color="#000000" label="grasses" alpha="255"/>
          <paletteEntry value="1" color="#255b97" label="wheat" alpha="255"/>
          <paletteEntry value="2" color="#4ab62e" label="barley" alpha="255"/>
          <paletteEntry value="3" color="#6f11c5" label="maize" alpha="255"/>
          <paletteEntry value="4" color="#946c5c" label="other cereals" alpha="255"/>
          <paletteEntry value="5" color="#b9c7f3" label="rice" alpha="255"/>
          <paletteEntry value="6" color="#de228a" label="flax/hemp/tobacco" alpha="255"/>
          <paletteEntry value="7" color="#037d21" label="sunflower" alpha="255"/>
          <paletteEntry value="8" color="#28d8b8" label="rapeseed" alpha="255"/>
          <paletteEntry value="9" color="#4d334f" label="other oilseed crops" alpha="255"/>
          <paletteEntry value="10" color="#728ee6" label="soy" alpha="255"/>
          <paletteEntry value="11" color="#97e97d" label="other protein crops" alpha="255"/>
          <paletteEntry value="12" color="#bc4414" label="fodder legumes" alpha="255"/>
          <paletteEntry value="13" color="#e19fab" label="beetroots" alpha="255"/>
          <paletteEntry value="14" color="#06fa42" label="potatoes" alpha="255"/>
          <paletteEntry value="15" color="#2b55d9" label="other arable crops" alpha="255"/>
          <paletteEntry value="16" color="#50b070" label="vineyard" alpha="255"/>
          <paletteEntry value="17" color="#750b07" label="olive groves" alpha="255"/>
          <paletteEntry value="18" color="#9a669e" label="fruits orchards" alpha="255"/>
          <paletteEntry value="19" color="#bfc135" label="nut orchards" alpha="255"/>
          <paletteEntry value="20" color="#e41ccc" label="other permanent crops" alpha="255"/>
          <paletteEntry value="21" color="#097763" label="mixed crops" alpha="255"/>
          <paletteEntry value="22" color="#2ed2fa" label="background" alpha="255"/>
      </colorPalette>
    </rasterrenderer>
    <brightnesscontrast brightness="0" contrast="0"/>
    <huesaturation colorizeOn="0" saturation="0" grayscaleMode="0"/>
    <rasterresampler maxOversampling="2"/>
  </pipe>
  <blendMode>0</blendMode>
</qgis>
